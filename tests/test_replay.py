"""Ring-replay invariants: append order, absorbing wrap, sampling bounds,
trajectory counting, transfer — matching reference memory.py semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from iltpu.data.replay import (
    replay_append_batch,
    replay_from_transitions,
    replay_init,
    replay_sample,
    replay_transfer,
)

S, A = 4, 2  # state size includes the absorbing bit when absorbing=True


def _append_one(rs, step, s, a, r, s2, term, tout):
    return replay_append_batch(
        rs,
        jnp.array([step]),
        jnp.array([s]),
        jnp.array([a]),
        jnp.array([r]),
        jnp.array([s2]),
        jnp.array([term]),
        jnp.array([tout]),
    )


def test_append_basic_ring_write():
    rs = replay_init(8, S, A, absorbing=False)
    s = np.arange(S, dtype=np.float32)
    rs = _append_one(rs, 1, s, np.zeros(A, np.float32), 0.5, s + 1, False, False)
    assert int(rs.idx) == 1
    assert not bool(rs.full)
    np.testing.assert_allclose(np.asarray(rs.states[0]), s)
    np.testing.assert_allclose(float(rs.rewards[0]), 0.5)
    assert float(rs.weights[0]) == 1.0
    assert int(rs.num_trajectories) == 0


def test_absorbing_wrap_on_terminal():
    """A true terminal under absorbing=True writes TWO rows: the rewritten
    transition (next_state=absorbing, terminal cleared) and the absorbing
    self-loop — memory.py:65-68."""
    rs = replay_init(8, S, A, absorbing=True)
    s = np.ones(S, np.float32)
    s2 = 2 * np.ones(S, np.float32)
    a = 0.3 * np.ones(A, np.float32)
    rs = _append_one(rs, 7, s, a, 1.0, s2, True, False)
    assert int(rs.idx) == 2
    absorbing_state = np.zeros(S, np.float32)
    absorbing_state[-1] = 1.0
    # Row 0: rewritten transition
    np.testing.assert_allclose(np.asarray(rs.states[0]), s)
    np.testing.assert_allclose(np.asarray(rs.next_states[0]), absorbing_state)
    assert float(rs.terminals[0]) == 0.0
    assert float(rs.rewards[0]) == 1.0
    # Row 1: absorbing self-loop with zero action/reward
    np.testing.assert_allclose(np.asarray(rs.states[1]), absorbing_state)
    np.testing.assert_allclose(np.asarray(rs.next_states[1]), absorbing_state)
    np.testing.assert_allclose(np.asarray(rs.actions[1]), np.zeros(A))
    assert float(rs.rewards[1]) == 0.0
    assert float(rs.terminals[1]) == 0.0
    assert float(rs.step[1]) == 7.0  # same step id as the wrapped transition
    assert int(rs.num_trajectories) == 1


def test_timeout_is_not_wrapped():
    rs = replay_init(8, S, A, absorbing=True)
    s = np.ones(S, np.float32)
    rs = _append_one(rs, 3, s, np.zeros(A, np.float32), 0.0, 2 * s, False, True)
    assert int(rs.idx) == 1  # single row
    assert float(rs.terminals[0]) == 0.0
    assert float(rs.timeouts[0]) == 1.0
    np.testing.assert_allclose(np.asarray(rs.next_states[0]), 2 * s)
    assert int(rs.num_trajectories) == 1


def test_no_absorbing_buffer_stores_terminal():
    rs = replay_init(8, S, A, absorbing=False)
    s = np.ones(S, np.float32)
    rs = _append_one(rs, 3, s, np.zeros(A, np.float32), 0.0, 2 * s, True, False)
    assert int(rs.idx) == 1
    assert float(rs.terminals[0]) == 1.0


def test_ring_wraparound_and_full_flag():
    rs = replay_init(4, S, A, absorbing=False)
    for i in range(6):
        s = np.full(S, i, np.float32)
        rs = _append_one(rs, i + 1, s, np.zeros(A, np.float32), float(i), s, False, False)
    assert bool(rs.full)
    assert int(rs.idx) == 2
    # slots 0,1 hold transitions 4,5; slots 2,3 hold 2,3
    np.testing.assert_allclose(np.asarray(rs.rewards), [4.0, 5.0, 2.0, 3.0])


def test_batched_append_matches_sequential():
    rs_seq = replay_init(32, S, A, absorbing=True)
    rs_bat = replay_init(32, S, A, absorbing=True)
    rng = np.random.default_rng(0)
    n = 5
    steps = np.arange(1, n + 1)
    states = rng.normal(size=(n, S)).astype(np.float32)
    actions = rng.normal(size=(n, A)).astype(np.float32)
    rewards = rng.normal(size=n).astype(np.float32)
    next_states = rng.normal(size=(n, S)).astype(np.float32)
    terms = np.array([False, True, False, False, True])
    touts = np.array([False, False, True, False, False])
    for i in range(n):
        rs_seq = _append_one(
            rs_seq, steps[i], states[i], actions[i], rewards[i], next_states[i],
            bool(terms[i]), bool(touts[i]),
        )
    rs_bat = replay_append_batch(
        rs_bat, jnp.array(steps), jnp.array(states), jnp.array(actions),
        jnp.array(rewards), jnp.array(next_states), jnp.array(terms),
        jnp.array(touts),
    )
    for field in ("step", "states", "actions", "rewards", "next_states",
                  "terminals", "timeouts", "weights"):
        np.testing.assert_allclose(
            np.asarray(getattr(rs_seq, field)), np.asarray(getattr(rs_bat, field)),
            err_msg=field,
        )
    assert int(rs_seq.idx) == int(rs_bat.idx)
    assert int(rs_seq.num_trajectories) == int(rs_bat.num_trajectories) == 3


def test_sample_excludes_write_head_not_full():
    rs = replay_init(16, S, A, absorbing=False)
    for i in range(6):
        s = np.full(S, i, np.float32)
        rs = _append_one(rs, i, s, np.zeros(A, np.float32), float(i), s, False, False)
    # idx=6 -> valid sample range [0, 4] (reference samples randint(0, idx-1))
    batch = replay_sample(rs, jax.random.key(0), 512)
    r = np.asarray(batch["rewards"])
    assert r.min() >= 0 and r.max() <= 4.0
    assert set(np.unique(r)) == {0.0, 1.0, 2.0, 3.0, 4.0}


def test_sample_excludes_most_recent_when_full():
    rs = replay_init(4, S, A, absorbing=False)
    for i in range(6):
        s = np.full(S, i, np.float32)
        rs = _append_one(rs, i, s, np.zeros(A, np.float32), float(i), s, False, False)
    # Buffer holds rewards [4, 5, 2, 3]; most recent = 5 at slot 1 (idx=2).
    batch = replay_sample(rs, jax.random.key(1), 512)
    r = np.asarray(batch["rewards"])
    assert 5.0 not in np.unique(r)
    assert set(np.unique(r)) == {2.0, 3.0, 4.0}


def test_sample_absorbing_flag_from_state_bit():
    rs = replay_init(8, S, A, absorbing=True)
    s = np.ones(S, np.float32)
    rs = _append_one(rs, 1, s, np.zeros(A, np.float32), 0.0, s, True, False)
    rs = _append_one(rs, 2, s, np.zeros(A, np.float32), 0.0, s, False, False)
    rs = _append_one(rs, 3, s, np.zeros(A, np.float32), 0.0, s, False, False)
    batch = replay_sample(rs, jax.random.key(0), 256)
    absorb = np.asarray(batch["absorbing"])
    states = np.asarray(batch["states"])
    np.testing.assert_allclose(absorb, states[:, -1])
    assert absorb.max() == 1.0  # the absorbing self-loop row is sampled


def test_expert_buffer_and_transfer():
    transitions = {
        "states": np.arange(12, dtype=np.float32).reshape(3, S),
        "actions": np.zeros((3, A), np.float32),
        "rewards": np.zeros(3, np.float32),
        "next_states": np.arange(12, dtype=np.float32).reshape(3, S) + 1,
        "terminals": np.array([0, 0, 1], np.float32),
        "timeouts": np.zeros(3, np.float32),
        "weights": np.array([1, 1, 0.5], np.float32),
    }
    expert = replay_from_transitions(transitions, num_trajectories=1, absorbing=False)
    assert bool(expert.full)
    assert int(expert.num_trajectories) == 1
    np.testing.assert_allclose(np.asarray(expert.step), [1.0, 2.0, 3.0])

    agent = replay_init(10, S, A, absorbing=False)
    agent = replay_transfer(agent, expert)
    assert int(agent.idx) == 3
    assert int(agent.num_trajectories) == 1
    np.testing.assert_allclose(np.asarray(agent.states[:3]),
                               np.asarray(expert.states))
    # transfer drops source importance weights (memory.py:46-48)
    np.testing.assert_allclose(np.asarray(agent.weights[:3]), np.ones(3))


def test_append_under_jit_donation():
    rs = replay_init(64, S, A, absorbing=True)

    @jax.jit
    def step(rs, i):
        s = jnp.full((1, S), i, jnp.float32)
        return replay_append_batch(
            rs, jnp.array([i]), s, jnp.zeros((1, A)), jnp.array([0.0]), s,
            jnp.array([False]), jnp.array([False]),
        )

    for i in range(5):
        rs = step(rs, i)
    assert int(rs.idx) == 5
