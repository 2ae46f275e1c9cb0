"""The fused update scan (training.fused_update_scan — leaf-layout carry +
pre-scan vmapped RNG, trainer fast path) must match the per-step Pallas
update scan to float rounding: same kernels, same operands, same key
derivation — only the glue (moment unravel/ravel placement, RNG batching)
moves, so XLA's differing fusion around the kernels perturbs results by
at most ~1 ulp (a wiring bug would produce O(1) differences). Pinned here
by driving both trainers' `_transition_core` with the same state and step
data (interpret-mode kernels off-TPU), and by a short end-to-end run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.config import load_config
from iltpu.trainer import Trainer, train

BASE = [
    "algorithm=GAIL",
    "env=pointmass",
    "env_backend=jax",
    "steps=300",
    "training.start=64",
    "num_envs=4",
    "evaluation.interval=1000",
    "evaluation.episodes=1",
    "logging.interval=0",
    "memory.size=1000",
    "imitation.trajectories=4",
    "training.batch_size=16",
    "training.sac_pallas=true",
    "training.disc_pallas=true",
]

TUNEDLIKE = [
    "imitation.loss_function=Mixup",
    "imitation.discriminator.reward_function=AIRL",
    "imitation.entropy_bonus=0.01",
]


def _make(tmp_path, fused, extra=()):
    cfg = load_config(
        BASE
        + list(extra)
        + [f"training.fused_update_scan={'true' if fused else 'false'}"]
    )
    return Trainer(cfg, out_dir=str(tmp_path / f"fused{int(fused)}"))


def _step_data(key, n, S, A):
    ks = jax.random.split(key, 4)
    return dict(
        obs=jax.random.normal(ks[0], (n, S)),
        actions=jnp.tanh(jax.random.normal(ks[1], (n, A))),
        rewards=jax.random.normal(ks[2], (n,)),
        next_obs=jax.random.normal(ks[3], (n, S)),
        terminals=(jax.random.uniform(ks[2], (n,)) < 0.2).astype(jnp.float32),
        timeouts=jnp.zeros((n,), jnp.float32),
    )


@pytest.mark.parametrize("block", [1, 4], ids=["perstep", "kblock4"])
@pytest.mark.parametrize("extra", [(), TUNEDLIKE], ids=["bce_sn", "mixup_airl"])
def test_fused_scan_bit_identical(tmp_path, extra, block):
    slow = _make(tmp_path, False, extra)
    fast = _make(
        tmp_path, True, tuple(extra) + (f"training.update_block={block}",)
    )
    S = slow.env.obs_size
    A = slow.env.action_size
    n = 4

    state_s = state_f = slow.state  # identical starting pytree
    for it in range(3):
        data = _step_data(jax.random.key(100 + it), n, S, A)
        base_key = jax.random.key(7 + it)
        step = jnp.asarray(it * n, jnp.int32)
        args = (
            base_key,
            step,
            data["obs"],
            data["actions"],
            data["rewards"],
            data["next_obs"],
            data["terminals"],
            data["timeouts"],
        )
        state_s, aux_s = slow._transition_core(state_s, *args, n_updates=8)
        state_f, aux_f = fast._transition_core(state_f, *args, n_updates=8)
        for name, a, b in (("state", state_s, state_f), ("aux", aux_s, aux_f)):
            la = jax.tree.leaves(a)
            lb = jax.tree.leaves(b)
            assert len(la) == len(lb), name
            for x, y in zip(la, lb):
                np.testing.assert_allclose(
                    np.asarray(x),
                    np.asarray(y),
                    rtol=1e-4,
                    atol=1e-7,
                    err_msg=f"{name} iter {it}",
                )


def test_fused_scan_end_to_end(tmp_path):
    cfg = load_config(BASE + ["training.fused_update_scan=true"])
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_fused_scan_guard(tmp_path):
    with pytest.raises(ValueError):
        Trainer(
            load_config(
                [
                    "algorithm=GAIL",
                    "env=pointmass",
                    "env_backend=jax",
                    "training.fused_update_scan=true",  # without the kernels
                ]
            ),
            out_dir=str(tmp_path),
        )
