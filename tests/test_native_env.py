"""Native C++ vectorised MuJoCo stepper: parity vs gymnasium + contract.

The stepper (native/vecenv.cc via iltpu.envs.native) must reproduce
Gym-v4 observation/reward/termination semantics to float32 precision —
verified here by injecting identical (qpos, qvel) into both engines and
stepping with the same actions.
"""

import numpy as np
import pytest

from iltpu.envs.native import _NATIVE_SPEC, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native stepper not buildable here"
)


@pytest.mark.parametrize("name", ["hopper", "ant"])
def test_parity_with_gymnasium(name):
    import gymnasium as gym

    from iltpu.envs.native import NativeVecEnv
    from iltpu.envs.scores import SPECS

    spec = SPECS[name]
    g = gym.make(spec.gym_id, **spec.gym_kwargs).unwrapped
    g.reset(seed=0)
    n = NativeVecEnv(name, 1, absorbing=False, seed=0)
    n.reset()
    rng = np.random.default_rng(7)
    nq, nv = g.model.nq, g.model.nv
    for _ in range(5):
        qpos = g.init_qpos + rng.uniform(-0.01, 0.01, nq)
        qvel = g.init_qvel + rng.uniform(-0.01, 0.01, nv)
        g.set_state(qpos, qvel)
        n.set_state(0, qpos, qvel)
        for _ in range(10):
            a = rng.uniform(-1, 1, g.action_space.shape).astype(np.float32)
            go, gr, gterm, _, _ = g.step(a)
            no, nr, nterm, _, _ = n.step(a[None])
            np.testing.assert_allclose(no[0], go, atol=1e-5)
            assert abs(float(nr[0]) - float(gr)) < 1e-5
            assert bool(nterm[0]) == bool(gterm)
            if gterm:
                break
    n.close()
    g.close()


def test_absorbing_bit_and_shapes():
    from iltpu.envs.native import NativeVecEnv
    from iltpu.envs.scores import SPECS

    env = NativeVecEnv("hopper", 3, absorbing=True, seed=0)
    obs = env.reset()
    assert obs.shape == (3, SPECS["hopper"].obs_size + 1)
    assert (obs[:, -1] == 0).all()
    a = np.zeros((3, env.action_size), np.float32)
    next_obs, r, term, to, after = env.step(a)
    for arr in (next_obs, after):
        assert arr.shape == obs.shape and (arr[:, -1] == 0).all()
    assert r.shape == term.shape == to.shape == (3,)
    env.close()


def test_timeout_and_autoreset():
    from iltpu.envs.native import NativeVecEnv

    env = NativeVecEnv("halfcheetah", 1, absorbing=False, seed=0)
    env.spec = env.spec._replace(time_limit=1000)
    obs = env.reset()
    # halfcheetah never terminates -> run to the time limit and expect a
    # timeout (not a terminal) plus a reset obs different from next_obs.
    hit = False
    a = np.zeros((1, env.action_size), np.float32)
    for t in range(1001):
        next_obs, r, term, to, after = env.step(a)
        assert term[0] == 0.0
        if to[0]:
            hit = True
            assert not np.allclose(next_obs, after)
            break
    assert hit
    env.close()


def test_reset_is_seeded_and_noisy():
    from iltpu.envs.native import NativeVecEnv

    env = NativeVecEnv("walker2d", 2, absorbing=False, seed=0)
    o1 = env.reset(seed=5)
    o2 = env.reset(seed=5)
    o3 = env.reset(seed=6)
    np.testing.assert_array_equal(o1, o2)
    assert not np.allclose(o1, o3)
    assert not np.allclose(o1[0], o1[1])  # per-env streams differ
    env.close()


def test_trainer_runs_on_native_backend(tmp_path):
    from iltpu.config import load_config
    from iltpu.trainer import train

    cfg = load_config(
        [
            "algorithm=SAC",
            "env=hopper",
            "env_backend=native",
            "steps=120",
            "training.start=50",
            "training.batch_size=32",
            "evaluation.interval=100",
            "evaluation.episodes=2",
            "logging.interval=0",
            "memory.size=500",
            "imitation.trajectories=2",
            "expert_data.source=synthetic",
        ]
    )
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_all_envs_have_native_specs():
    from iltpu.envs.scores import ENVS

    assert set(_NATIVE_SPEC) == set(ENVS)
