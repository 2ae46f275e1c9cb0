"""Model-stack tests: MLP init/apply, spectral norm, tanh-Gaussian parity
with torch.distributions, critics and Polyak updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.models import (
    MLP,
    Critic,
    SoftActor,
    TwinCritic,
    create_target_params,
    polyak_update,
    update_spectral_norm,
)
from iltpu.models import distributions as D


def test_mlp_shapes_and_orthogonal_init():
    net = MLP(10, 32, 2, 4, "relu")
    params = net.init(jax.random.key(0))
    assert len(params["layers"]) == 3
    w0 = np.asarray(params["layers"][0]["w"])  # (10, 32): rows orthonormal
    gram = w0 @ w0.T / 2.0  # undo relu gain sqrt(2)^2
    np.testing.assert_allclose(gram, np.eye(10), atol=1e-5)
    # final layer gain 1
    wf = np.asarray(params["layers"][-1]["w"])  # (32, 4) cols orthonormal
    np.testing.assert_allclose(wf.T @ wf, np.eye(4), atol=1e-5)
    # zero bias
    assert not np.asarray(params["layers"][0]["b"]).any()
    y = net.apply(params, jnp.ones((7, 10)))
    assert y.shape == (7, 4)


def test_mlp_dropout_train_vs_eval():
    net = MLP(8, 16, 1, 2, "relu", input_dropout=0.5, dropout=0.5)
    params = net.init(jax.random.key(0))
    x = jnp.ones((4, 8))
    y_eval = net.apply(params, x)
    y_eval2 = net.apply(params, x, rng=jax.random.key(1), train=False)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_eval2))
    y_train_a = net.apply(params, x, rng=jax.random.key(1), train=True)
    y_train_b = net.apply(params, x, rng=jax.random.key(2), train=True)
    assert not np.allclose(np.asarray(y_train_a), np.asarray(y_train_b))


def test_spectral_norm_bounds_singular_value():
    net = MLP(6, 12, 1, 1, "relu", spectral_norm=True)
    params = net.init(jax.random.key(0))
    # Scale weights up; after a few power iterations sigma estimate converges
    params = jax.tree.map(lambda x: x * 5.0, params)
    for _ in range(50):
        params = update_spectral_norm(params)
    for layer in params["layers"]:
        u, v, w = layer["u"], layer["v"], layer["w"]
        sigma = float(v @ w @ u)
        true_sigma = float(jnp.linalg.norm(w, ord=2))
        assert sigma == pytest.approx(true_sigma, rel=1e-3)


def test_tanh_gaussian_log_prob_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.distributions import (
        Independent,
        Normal,
        TransformedDistribution,
    )
    from torch.distributions.transforms import TanhTransform

    rng = np.random.default_rng(0)
    mean = rng.normal(size=(5, 3)).astype(np.float32)
    log_std = rng.uniform(-2, 0.5, size=(5, 3)).astype(np.float32)
    action = np.tanh(rng.normal(size=(5, 3))).astype(np.float32)

    t_dist = TransformedDistribution(
        Independent(Normal(torch.tensor(mean), torch.tensor(log_std).exp()), 1),
        TanhTransform(cache_size=1),
    )
    a_clamped = torch.tensor(action).clamp(-1 + 1e-6, 1 - 1e-6)
    expected = t_dist.log_prob(a_clamped).numpy()

    got = np.asarray(
        D.log_prob_of_action(jnp.array(mean), jnp.array(log_std), jnp.array(action))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_actor_sample_log_prob_consistency():
    actor = SoftActor(11, 3)
    params = actor.init(jax.random.key(0))
    state = jax.random.normal(jax.random.key(1), (64, 11))
    action, lp = actor.sample(params, jax.random.key(2), state)
    assert action.shape == (64, 3)
    assert (jnp.abs(action) < 1).all()
    lp2 = actor.log_prob(params, state, action)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-3, atol=1e-3)


def test_actor_greedy_deterministic():
    actor = SoftActor(4, 2)
    params = actor.init(jax.random.key(0))
    s = jnp.ones((1, 4))
    a1, a2 = actor.greedy_action(params, s), actor.greedy_action(params, s)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_dril_uncertainty_and_threshold():
    actor = SoftActor(6, 2, hidden_size=64, depth=1, activation="tanh",
                      input_dropout=0.1, dropout=0.1)
    params = actor.init(jax.random.key(0))
    s = jax.random.normal(jax.random.key(1), (128, 6))
    a = jnp.tanh(jax.random.normal(jax.random.key(2), (128, 2)))
    u = actor.action_uncertainty(params, jax.random.key(3), s, a)
    assert u.shape == (128,)
    assert (np.asarray(u) >= 0).all()
    q = actor.uncertainty_threshold(params, jax.random.key(3), s, a, 0.98)
    r = actor.dril_reward(params, jax.random.key(3), s, a, q)
    assert set(np.unique(np.asarray(r))) <= {-1.0, 1.0}
    # With the same key, ~98% of expert data should be below the threshold
    assert np.mean(np.asarray(r) == 1.0) >= 0.9


def test_twin_critic_and_polyak():
    critic = TwinCritic(5, 2, hidden_size=32, depth=1)
    params = critic.init(jax.random.key(0))
    target = create_target_params(params)
    s, a = jnp.ones((3, 5)), jnp.ones((3, 2))
    q1, q2 = critic.apply(params, s, a)
    assert q1.shape == (3,) and q2.shape == (3,)
    assert not np.allclose(np.asarray(q1), np.asarray(q2))  # independent nets

    moved = jax.tree.map(lambda x: x + 1.0, params)
    new_target = polyak_update(moved, target, 0.9)
    # target moved 10% towards online
    expected = jax.tree.map(lambda t, p: 0.9 * t + 0.1 * p, target, moved)
    for g, e in zip(jax.tree.leaves(new_target), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), rtol=1e-6)


def test_host_greedy_matches_device_greedy():
    """numpy eval-path inference (host_inference.py) is exact vs the jitted
    greedy_action for every supported activation."""
    import numpy as np

    from iltpu.models.host_inference import host_greedy_fn

    for activation in ("relu", "tanh", "sigmoid"):
        actor = SoftActor(11, 3, hidden_size=32, depth=2, activation=activation)
        params = actor.init(jax.random.key(3))
        obs = jax.random.normal(jax.random.key(4), (17, 11))
        want = np.asarray(actor.greedy_action(params, obs))
        got = host_greedy_fn(actor, params)(np.asarray(obs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # single-observation (unbatched) convenience path
        got1 = host_greedy_fn(actor, params)(np.asarray(obs)[0])
        np.testing.assert_allclose(got1, want[0], rtol=1e-5, atol=1e-6)


def test_host_actor_sampling_matches_policy_distribution():
    """HostActor's numpy tanh-Gaussian matches the device policy: greedy is
    exact, and sampled actions have the right conditional moments."""
    import numpy as np

    from iltpu.models.host_inference import HostActor

    actor = SoftActor(6, 2, hidden_size=32, depth=2)
    params = actor.init(jax.random.key(0))
    host = HostActor(actor, params)

    obs = jax.random.normal(jax.random.key(1), (5, 6))
    np.testing.assert_allclose(
        host.greedy(np.asarray(obs)),
        np.asarray(actor.greedy_action(params, obs)),
        rtol=1e-5,
        atol=1e-6,
    )

    # Moment check: pre-tanh samples should have the policy's mean/std.
    mean_d, log_std_d = actor.dist(params, obs)
    rng = np.random.default_rng(0)
    samples = np.stack([host.sample(np.asarray(obs), rng) for _ in range(4000)])
    z = np.arctanh(np.clip(samples, -1 + 1e-7, 1 - 1e-7))
    np.testing.assert_allclose(
        z.mean(axis=0), np.asarray(mean_d), atol=4 * np.exp(np.asarray(log_std_d)).max() / 63
    )
    np.testing.assert_allclose(
        z.std(axis=0), np.exp(np.asarray(log_std_d)), rtol=0.1
    )
