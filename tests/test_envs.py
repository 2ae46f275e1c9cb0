"""Env-layer tests: host vectorised MuJoCo adapter (absorbing bit,
terminal/timeout split, auto-reset), pure-JAX VecEnv under jit/vmap, and
the D4RL score table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.envs import (
    JAX_ENVS,
    SPECS,
    HostVecEnv,
    Pendulum,
    PointMass2D,
    VecEnv,
    d4rl_normalized_score,
    evaluate_policy,
)


def test_normalized_score_endpoints():
    assert d4rl_normalized_score("hopper", SPECS["hopper"].ref_min_score) == 0.0
    assert d4rl_normalized_score("hopper", SPECS["hopper"].ref_max_score) == 1.0


# --- Host MuJoCo envs ------------------------------------------------------


def test_host_vec_env_hopper_shapes_and_absorbing_bit():
    env = HostVecEnv("hopper", num_envs=3, absorbing=True, seed=0)
    obs = env.reset()
    assert obs.shape == (3, SPECS["hopper"].obs_size + 1)
    np.testing.assert_allclose(obs[:, -1], 0.0)  # live states carry a 0 bit
    actions = np.random.default_rng(0).uniform(-1, 1, (3, env.action_size))
    next_obs, rewards, terminals, timeouts, obs2 = env.step(actions)
    assert next_obs.shape == obs.shape and obs2.shape == obs.shape
    assert rewards.shape == (3,)
    np.testing.assert_allclose(next_obs[:, -1], 0.0)
    env.close()


def test_host_vec_env_threaded_step_matches_serial():
    """The per-worker-chunked thread pool must be bit-identical to the
    serial loop: each worker owns a disjoint contiguous env slice, so no
    write overlaps and no ordering effects."""
    a = HostVecEnv("hopper", num_envs=4, absorbing=True, seed=5)
    b = HostVecEnv("hopper", num_envs=4, absorbing=True, seed=5)
    if b._pool is not None:
        b._pool.shutdown(wait=False)
        b._pool = None  # force the serial path
    oa, ob = a.reset(5), b.reset(5)
    np.testing.assert_array_equal(oa, ob)
    rng = np.random.default_rng(3)
    for _ in range(50):
        act = rng.uniform(-1, 1, (4, a.action_size)).astype(np.float32)
        ra, rb = a.step(act), b.step(act)
        for xa, xb in zip(ra, rb):
            np.testing.assert_array_equal(xa, xb)
    a.close()
    b.close()


def test_host_vec_env_auto_reset_and_terminal_split():
    """Hopper falls quickly under max-torque actions: within a few hundred
    steps every env must have terminated (terminal=1, timeout=0) and been
    auto-reset with a fresh healthy observation."""
    env = HostVecEnv("hopper", num_envs=2, absorbing=True, seed=1)
    obs = env.reset()
    saw_terminal = False
    for _ in range(300):
        a = np.ones((2, env.action_size), np.float32)
        next_obs, r, term, tout, obs = env.step(a)
        if term.any():
            saw_terminal = True
            assert not tout[term > 0].any()
            i = int(np.argmax(term))
            # post-reset obs differs from the true (failed) successor
            assert not np.allclose(obs[i], next_obs[i])
            break
    assert saw_terminal
    env.close()


def test_host_action_clipping():
    env = HostVecEnv("hopper", num_envs=1, absorbing=False, seed=2)
    env.reset()
    # out-of-range actions must not crash (clipped to the space bounds)
    env.step(np.full((1, env.action_size), 100.0, np.float32))
    env.close()


def test_evaluate_policy_batched():
    returns = evaluate_policy(
        "hopper",
        lambda obs: np.zeros((obs.shape[0], 3), np.float32),
        num_episodes=4,
        seed=3,
    )
    assert len(returns) == 4
    assert all(np.isfinite(r) for r in returns)
    rets, trajs = evaluate_policy(
        "hopper",
        lambda obs: np.zeros((obs.shape[0], 3), np.float32),
        num_episodes=2,
        seed=4,
        return_trajectories=True,
    )
    assert len(trajs) == 2
    for t in trajs:
        assert t["terminals"][-1] == 1.0 and (t["terminals"][:-1] == 0).all()
        assert t["states"].shape[0] == t["rewards"].shape[0]


# --- Pure-JAX envs ---------------------------------------------------------


@pytest.mark.parametrize("name", list(JAX_ENVS))
def test_jax_env_step_under_jit_vmap(name):
    venv = VecEnv(JAX_ENVS[name](), num_envs=8, absorbing=True)
    state = venv.reset(jax.random.key(0))
    assert state.obs.shape == (8, venv.obs_size)

    @jax.jit
    def roll(state, key):
        def body(st, k):
            a = jax.random.uniform(
                k, (8, venv.action_size), minval=-1.0, maxval=1.0
            )
            st, out = venv.step(st, a)
            return st, out.reward

        state, rewards = jax.lax.scan(body, state, jax.random.split(key, 50))
        return state, rewards

    state, rewards = roll(state, jax.random.key(1))
    assert rewards.shape == (50, 8)
    assert np.isfinite(np.asarray(rewards)).all()
    assert np.isfinite(np.asarray(state.obs)).all()
    np.testing.assert_allclose(np.asarray(state.obs[:, -1]), 0.0)


def test_jax_env_timeout_flag_pendulum():
    """Pendulum never terminates: exactly at max_episode_steps every env
    must flag timeout (not terminal) and auto-reset (t back to 0)."""
    env = Pendulum()
    venv = VecEnv(env, num_envs=4, absorbing=False)
    state = venv.reset(jax.random.key(0))
    step = jax.jit(venv.step)
    for i in range(env.max_episode_steps):
        state, out = step(state, jnp.zeros((4, 1)))
    assert np.asarray(out.timeout).all()
    assert not np.asarray(out.terminal).any()
    assert (np.asarray(state.t) == 0).all()


def test_jax_env_pointmass_terminates_and_resets():
    """Steering straight at the goal must terminate inside the radius."""
    env = PointMass2D()
    venv = VecEnv(env, num_envs=2, absorbing=True)
    state = venv.reset(jax.random.key(3))
    step = jax.jit(venv.step)
    terminated = False
    for _ in range(env.max_episode_steps - 1):
        pos = np.asarray(state.inner.pos)
        a = jnp.asarray(-np.sign(pos), jnp.float32)  # accelerate toward origin
        state, out = step(state, a)
        if np.asarray(out.terminal).any():
            terminated = True
            i = int(np.argmax(np.asarray(out.terminal)))
            assert np.linalg.norm(np.asarray(out.next_obs)[i, :2]) < env.goal_radius
            assert int(np.asarray(state.t)[i]) == 0  # auto-reset
            break
    assert terminated


def test_jax_env_action_clipping():
    env = Pendulum()
    venv = VecEnv(env, num_envs=1, absorbing=False)
    state = venv.reset(jax.random.key(0))
    s1, out1 = venv.step(state, jnp.full((1, 1), 100.0))
    s2, out2 = venv.step(state, jnp.full((1, 1), 2.0))
    np.testing.assert_allclose(
        np.asarray(out1.next_obs), np.asarray(out2.next_obs)
    )


def test_render_rollout_writes_frames(tmp_path):
    import numpy as np
    import pytest

    from iltpu.envs.host import render_rollout

    out = str(tmp_path / "roll.npz")
    try:
        n = render_rollout(
            "hopper",
            lambda o: np.zeros((1, 3), np.float32),
            out,
            max_frames=3,
        )
    except Exception as e:
        pytest.skip(f"no offscreen GL available: {e}")
    frames = np.load(out)["frames"]
    assert frames.shape[0] == n and frames.ndim == 4 and frames.dtype == np.uint8
