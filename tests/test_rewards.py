"""Reward-module tests: GAIL heads, GMMIL MMD witness, PWIL greedy
transport (vs a pure-NumPy oracle), RED RND reward, AdRIL/SQIL relabelling,
expert/agent batch mixing. Oracles are hand-derived from the formulas in
the reference (/root/reference/models.py:145-318), not translations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.rewards import (
    GAILDiscriminator,
    GMMILDiscriminator,
    PWILDiscriminator,
    REDDiscriminator,
    init_relabeller,
    mix_expert_agent_transitions,
    resample_and_relabel,
)

S, A, B = 5, 3, 8


def _batch(key, n=B):
    ks = jax.random.split(key, 2)
    return (
        jax.random.normal(ks[0], (n, S)),
        jnp.tanh(jax.random.normal(ks[1], (n, A))),
    )


# --- GAIL ------------------------------------------------------------------


@pytest.mark.parametrize("fn", ["GAIL", "AIRL", "FAIRL"])
def test_gail_reward_heads_match_formula(fn):
    disc = GAILDiscriminator(S, A, reward_function=fn)
    params = disc.init(jax.random.key(0))
    s, a = _batch(jax.random.key(1))
    logits = np.asarray(disc.forward(params, s, a))
    r = np.asarray(disc.predict_reward(params, s, a))
    D = 1.0 / (1.0 + np.exp(-logits))
    if fn == "GAIL":
        expected = -np.log1p(-D + 1e-6)
    else:
        expected = np.log(D + 1e-6) - np.log1p(-D + 1e-6)
    if fn == "FAIRL":
        expected = np.exp(expected) * -expected
    np.testing.assert_allclose(r, expected, rtol=1e-5, atol=1e-6)


def test_gail_state_only_ignores_action():
    disc = GAILDiscriminator(S, A, state_only=True)
    params = disc.init(jax.random.key(0))
    s, a = _batch(jax.random.key(1))
    _, a2 = _batch(jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(disc.forward(params, s, a)),
        np.asarray(disc.forward(params, s, a2)),
    )


def test_gail_reward_shaping_telescopes():
    """f = g(s,a) + (1-term)(gamma*h(s') - h(s)); terminal=1 must drop the
    shaping term entirely."""
    disc = GAILDiscriminator(S, A, reward_shaping=True, discount=0.9)
    params = disc.init(jax.random.key(0))
    s, a = _batch(jax.random.key(1))
    s2, _ = _batch(jax.random.key(2))
    term1 = jnp.ones((B,))
    f_term = disc.forward(params, s, a, s2, term1)
    g_only = disc.g.apply(params["g"], jnp.concatenate([s, a], -1))[..., 0]
    np.testing.assert_allclose(np.asarray(f_term), np.asarray(g_only), rtol=1e-6)
    # with terminal=0 the h-terms appear
    f0 = np.asarray(disc.forward(params, s, a, s2, jnp.zeros((B,))))
    h = lambda x: np.asarray(disc.h.apply(params["h"], x)[..., 0])
    np.testing.assert_allclose(
        f0, np.asarray(g_only) + 0.9 * h(s2) - h(s), rtol=1e-5, atol=1e-6
    )


def test_gail_subtract_log_policy():
    disc = GAILDiscriminator(S, A, subtract_log_policy=True)
    disc_plain = GAILDiscriminator(S, A)
    params = disc.init(jax.random.key(0))
    s, a = _batch(jax.random.key(1))
    lp = jnp.linspace(-1.0, 1.0, B)
    f = disc.forward(params, s, a, log_policy=lp)
    f_plain = disc_plain.forward(params, s, a)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_plain - lp), rtol=1e-6)


# --- GMMIL -----------------------------------------------------------------


def _np_weighted_median(x, w):
    xf, wf = x.ravel(), w.ravel() / w.sum()
    order = np.argsort(xf)
    cdf = np.cumsum(wf[order])
    return xf[order][int(np.argmax(cdf >= 0.5))]


def test_gmmil_matches_numpy_oracle_and_caches_bandwidths():
    disc = GMMILDiscriminator(S, A)
    carry = disc.init()
    s, a = _batch(jax.random.key(1))
    es, ea = _batch(jax.random.key(2))
    w = jnp.ones((B,))
    ew = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.5, B), jnp.float32)

    carry2, r = disc.predict_reward(carry, s, a, es, ea, w, ew)

    sa = np.concatenate([np.asarray(s), np.asarray(a)], -1)
    esa = np.concatenate([np.asarray(es), np.asarray(ea)], -1)
    d2 = lambda x, y: ((x[:, None] - y[None]) ** 2).mean(-1)
    d_ae, d_aa, d_ee = d2(sa, esa), d2(sa, sa), d2(esa, esa)
    wn, ewn = np.asarray(w), np.asarray(ew)
    g1 = 1.0 / (_np_weighted_median(d_ae, np.outer(wn, ewn)) + 1e-8)
    g2 = 1.0 / (_np_weighted_median(d_ee, np.outer(ewn, ewn)) + 1e-8)
    assert float(carry2.gamma_1) == pytest.approx(g1, rel=1e-4)
    assert float(carry2.gamma_2) == pytest.approx(g2, rel=1e-4)
    wn_, ewn_ = wn / wn.sum(), ewn / ewn.sum()
    sim = sum(wn_ * (np.exp(-g * d_ae) @ ewn_) for g in (g1, g2))
    self_sim = sum(wn_ * (np.exp(-g * d_aa) @ wn_) for g in (g1, g2))
    np.testing.assert_allclose(np.asarray(r), sim - self_sim, rtol=1e-3, atol=1e-5)

    # Bandwidths frozen after first call (models.py:193-195): feeding very
    # different data must reuse (gamma_1, gamma_2).
    carry3, _ = disc.predict_reward(carry2, 10 * s, a, es, ea, w, ew)
    assert float(carry3.gamma_1) == float(carry2.gamma_1)
    assert float(carry3.gamma_2) == float(carry2.gamma_2)


# --- PWIL ------------------------------------------------------------------


def _pwil_oracle(expert_atoms, expert_weights, agent_atom, time_horizon):
    """Greedy transport on normalised atoms (independent NumPy rewrite of
    the coupling described in the PWIL paper)."""
    atoms = expert_atoms.copy()
    weights = expert_weights.copy()
    dists = np.linalg.norm(atoms - agent_atom[None], axis=1)
    weight, cost = 1.0 / time_horizon - 1e-6, 0.0
    while weight > 0:
        i = int(np.argmin(np.where(weights > 0, dists, np.inf)))
        take = min(weight, weights[i])
        cost += take * dists[i]
        weights[i] -= take
        weight -= take
    return cost, weights


def test_pwil_matches_oracle_and_consumes_pool():
    n_expert, horizon = 12, 5
    rng = np.random.default_rng(3)
    es = rng.normal(size=(n_expert, S)).astype(np.float32)
    ea = np.tanh(rng.normal(size=(n_expert, A))).astype(np.float32)
    disc = PWILDiscriminator(
        S, A, expert_states=jnp.array(es), expert_actions=jnp.array(ea),
        time_horizon=horizon,
    )
    carry = disc.init()
    atoms = np.asarray(disc.expert_atoms)
    weights = np.full((n_expert,), 1.0 / n_expert)

    s = rng.normal(size=(S,)).astype(np.float32)
    a = np.tanh(rng.normal(size=(A,))).astype(np.float32)
    for _ in range(3):  # pool state must persist across steps
        carry, r = disc.compute_reward(carry, jnp.array(s), jnp.array(a))
        agent_atom = np.asarray(disc.data_scale) * (
            np.concatenate([s, a]) + np.asarray(disc.data_offset)
        )
        cost, weights = _pwil_oracle(atoms, weights, agent_atom, horizon)
        expected = disc.reward_scale * np.exp(-disc.reward_bandwidth * cost)
        assert float(r) == pytest.approx(float(expected), rel=1e-4)
        np.testing.assert_allclose(
            np.asarray(carry.expert_weights), weights, atol=1e-6
        )
    # reset restores the full pool (models.py:228-230)
    np.testing.assert_allclose(
        np.asarray(disc.reset().expert_weights), np.full((n_expert,), 1 / n_expert)
    )


def test_pwil_normalisation_constant_feature():
    es = np.ones((4, S), np.float32)  # zero variance -> scale 1
    ea = np.zeros((4, A), np.float32)
    disc = PWILDiscriminator(
        S, A, expert_states=jnp.array(es), expert_actions=jnp.array(ea)
    )
    np.testing.assert_allclose(np.asarray(disc.data_scale), np.ones(S + A))


def test_pwil_exhausted_pool_terminates():
    es = np.zeros((2, S), np.float32)
    ea = np.zeros((2, A), np.float32)
    disc = PWILDiscriminator(
        S, A, expert_states=jnp.array(es), expert_actions=jnp.array(ea),
        time_horizon=1,
    )
    carry = disc.init().replace(expert_weights=jnp.zeros((2,)))
    carry, r = jax.jit(disc.compute_reward)(carry, jnp.zeros(S), jnp.zeros(A))
    assert np.isfinite(float(r))


# --- RED -------------------------------------------------------------------


def test_red_reward_formula_and_sigma_heuristic():
    disc = REDDiscriminator(S, A)
    red = disc.init(jax.random.key(0))
    es, ea = _batch(jax.random.key(1))
    red = disc.set_sigma(red, es, ea)
    pred, tgt = disc.forward(red, es, ea)
    d2 = np.asarray(
        ((np.asarray(pred)[:, None] - np.asarray(tgt)[None]) ** 2).mean(-1)
    )
    assert float(red.sigma_1) == pytest.approx(1.0 / np.median(d2), rel=1e-2)
    s, a = _batch(jax.random.key(2))
    r = np.asarray(disc.predict_reward(red, s, a))
    p, t = disc.forward(red, s, a)
    expected = np.exp(
        -float(red.sigma_1) * ((np.asarray(p) - np.asarray(t)) ** 2).mean(-1)
    )
    np.testing.assert_allclose(r, expected, rtol=1e-4)
    assert (r > 0).all() and (r <= 1).all()


def test_red_sigma_from_config_not_overwritten():
    disc = REDDiscriminator(S, A, reward_bandwidth_scale=2.5)
    red = disc.init(jax.random.key(0))
    es, ea = _batch(jax.random.key(1))
    red = disc.set_sigma(red, es, ea)
    assert float(red.sigma_1) == 2.5


# --- AdRIL / SQIL ----------------------------------------------------------


def _transitions(key, n=B, reward=0.5, step=0):
    s, a = _batch(key, n)
    return {
        "step": jnp.full((n,), step, jnp.int32),
        "states": s,
        "actions": a,
        "rewards": jnp.full((n,), reward),
        "next_states": s,
        "terminals": jnp.zeros((n,)),
        "weights": jnp.ones((n,)),
        "absorbing": jnp.zeros((n,)),
    }


def test_adril_balanced_alternates_and_rewards():
    carry = init_relabeller()
    agent = _transitions(jax.random.key(0), step=5000)
    expert = _transitions(jax.random.key(1), step=0)
    kw = dict(update_freq=1250, balanced=True)
    n_traj, n_expert = jnp.asarray(10), jnp.asarray(4)

    # First call: pure expert batch, reward 1/4 everywhere.
    carry, out = resample_and_relabel(
        carry, agent, expert, jnp.asarray(5000), n_traj, n_expert, **kw
    )
    np.testing.assert_allclose(np.asarray(out["rewards"]), 0.25)
    np.testing.assert_allclose(np.asarray(out["states"]), np.asarray(expert["states"]))
    # Second call: pure policy batch; same round -> reward 0.
    carry, out = resample_and_relabel(
        carry, agent, expert, jnp.asarray(5000), n_traj, n_expert, **kw
    )
    np.testing.assert_allclose(np.asarray(out["rewards"]), 0.0)
    # Stale policy data (earlier round) -> -1/n_traj.
    stale = _transitions(jax.random.key(2), step=1000)
    carry, out = resample_and_relabel(
        carry, stale, expert, jnp.asarray(5000), n_traj, n_expert, **kw
    )
    assert float(carry.sample_expert) == 0.0  # next batch is pure policy
    carry, out = resample_and_relabel(
        carry, stale, expert, jnp.asarray(5000), n_traj, n_expert, **kw
    )
    np.testing.assert_allclose(np.asarray(out["rewards"]), -0.1)


def test_sqil_unbalanced_half_mix():
    carry = init_relabeller()
    agent = _transitions(jax.random.key(0))
    expert = _transitions(jax.random.key(1))
    carry, out = resample_and_relabel(
        carry, agent, expert, jnp.asarray(100), jnp.asarray(1), jnp.asarray(1),
        update_freq=0, balanced=False,
    )
    half = B // 2
    np.testing.assert_allclose(np.asarray(out["rewards"][:half]), 1.0)
    np.testing.assert_allclose(np.asarray(out["rewards"][half:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(out["states"][:half]), np.asarray(expert["states"][:half])
    )
    np.testing.assert_allclose(
        np.asarray(out["states"][half:]), np.asarray(agent["states"][half:])
    )


def test_mix_expert_agent_transitions():
    agent = _transitions(jax.random.key(0), reward=0.0)
    expert = _transitions(jax.random.key(1), reward=1.0)
    out = mix_expert_agent_transitions(agent, expert)
    half = B // 2
    np.testing.assert_allclose(np.asarray(out["rewards"][:half]), 1.0)
    np.testing.assert_allclose(np.asarray(out["rewards"][half:]), 0.0)
