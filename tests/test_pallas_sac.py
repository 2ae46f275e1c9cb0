"""The fused Pallas SAC-update kernel (iltpu/ops/pallas_sac.py) must be
numerically equivalent to `SACLearner.update` — same params, same
optimiser moments, same aux — since it replaces it 1:1 inside the update
scan when enabled. Runs in interpret mode off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.models.actor import SoftActor
from iltpu.models.critic import TwinCritic
from iltpu.ops.pallas_sac import sac_update_pallas
from iltpu.updates.sac import SACLearner


@pytest.fixture
def setup():
    S, A, B = 7, 3, 32
    actor = SoftActor(S, A, hidden_size=32, depth=2)
    critic = TwinCritic(S, A, hidden_size=32, depth=2)
    learner = SACLearner(
        actor, critic, learning_rate=3e-4, weight_decay=1e-2, discount=0.97,
        entropy_target=-2.0, polyak_factor=0.99,
    )
    state = learner.init(jax.random.key(0))
    ks = jax.random.split(jax.random.key(1), 8)
    t = {
        "states": jax.random.normal(ks[0], (B, S)),
        "actions": jnp.tanh(jax.random.normal(ks[1], (B, A))),
        "rewards": jax.random.normal(ks[2], (B,)),
        "next_states": jax.random.normal(ks[3], (B, S)),
        "terminals": (jax.random.uniform(ks[4], (B,)) < 0.1).astype(jnp.float32),
        "timeouts": jnp.zeros((B,)),
        "weights": 1.0 + jax.random.uniform(ks[5], (B,)),
        "absorbing": (jax.random.uniform(ks[6], (B,)) < 0.2).astype(jnp.float32),
        "step": jnp.zeros((B,)),
    }
    return learner, state, t


def _assert_state_close(got, want, rtol, atol):
    for name in ("actor_params", "critic_params", "target_critic_params",
                 "log_alpha", "actor_opt", "critic_opt", "alpha_opt"):
        for g, w in zip(
            jax.tree.leaves(getattr(got, name)),
            jax.tree.leaves(getattr(want, name)),
        ):
            np.testing.assert_allclose(
                np.asarray(g, np.float64), np.asarray(w, np.float64),
                rtol=rtol, atol=atol, err_msg=name,
            )


def test_pallas_update_matches_xla(setup):
    learner, state, t = setup
    key = jax.random.key(42)
    want_state, want_aux = learner.update(state, key, t)
    got_state, got_aux = sac_update_pallas(
        learner, state, key, t, interpret=True
    )
    _assert_state_close(got_state, want_state, rtol=2e-5, atol=2e-6)
    for k in ("log_probs", "Q_values", "alpha"):
        np.testing.assert_allclose(
            np.asarray(got_aux[k]), np.asarray(want_aux[k]),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )


def test_pallas_update_matches_xla_chained(setup):
    learner, state, t = setup
    s_pl = s_xla = state
    for i in range(5):
        key = jax.random.key(100 + i)
        s_pl, _ = sac_update_pallas(learner, s_pl, key, t, interpret=True)
        s_xla, _ = learner.update(s_xla, key, t)
    _assert_state_close(s_pl, s_xla, rtol=1e-4, atol=1e-5)


def test_pallas_update_min_alpha_floor(setup):
    """reinforcement.min_alpha inside the kernel: the floored alpha feeds
    the TD target / actor entropy term / aux, while the temperature
    gradient keeps the raw exp(log_alpha) (updates/sac.py:113-203)."""
    learner, state, t = setup
    learner.min_alpha = 0.05
    # Drive log_alpha well below the floor so the clamp is active.
    state = state.replace(log_alpha=jnp.full((1,), -6.0))
    key = jax.random.key(43)
    want_state, want_aux = learner.update(state, key, t)
    got_state, got_aux = sac_update_pallas(
        learner, state, key, t, interpret=True
    )
    assert abs(float(want_aux["alpha"]) - 0.05) < 1e-7  # floor engaged
    _assert_state_close(got_state, want_state, rtol=2e-5, atol=2e-6)
    for k in ("log_probs", "Q_values", "alpha"):
        np.testing.assert_allclose(
            np.asarray(got_aux[k]), np.asarray(want_aux[k]),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )
    learner.min_alpha = 0.0


def test_twin_cat_roundtrip_and_zero_blocks():
    """stacked <-> cat conversion is lossless, the cat off-diagonal
    blocks are exactly zero, and a masked AdamW step keeps them zero
    (they are not real parameters)."""
    from iltpu.ops.pallas_sac import (
        _adam_step,
        _twin_block_masks,
        twin_cat_to_stacked,
        twin_stacked_to_cat,
    )

    ks = jax.random.split(jax.random.key(5), 6)
    H, S_in = 8, 5
    st6 = (
        jax.random.normal(ks[0], (2, S_in, H)),
        jax.random.normal(ks[1], (2, H)),
        jax.random.normal(ks[2], (2, H, H)),
        jax.random.normal(ks[3], (2, H)),
        jax.random.normal(ks[4], (2, H, 1)),
        jax.random.normal(ks[5], (2, 1)),
    )
    c6 = twin_stacked_to_cat(st6)
    back = twin_cat_to_stacked(c6)
    for a, b in zip(st6, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # off-diagonal blocks exactly zero
    W2, W3 = np.asarray(c6[2]), np.asarray(c6[4])
    assert (W2[:H, H:] == 0).all() and (W2[H:, :H] == 0).all()
    assert (W3[:H, 1] == 0).all() and (W3[H:, 0] == 0).all()
    # one masked AdamW step from zero moments leaves the zeros exact
    mask2, mask3 = _twin_block_masks(2 * H)
    g2 = jax.random.normal(ks[0], (2 * H, 2 * H)) * mask2
    p, m, v = _adam_step(
        c6[2], g2, jnp.zeros_like(c6[2]), jnp.zeros_like(c6[2]),
        1.0, 3e-4, 1e-2,
    )
    for arr in (p, m, v):
        arr = np.asarray(arr)
        assert (arr[:H, H:] == 0).all() and (arr[H:, :H] == 0).all()
