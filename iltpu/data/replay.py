"""HBM-resident ring replay buffer with DAC absorbing-state handling.

Capability parity with the reference `ReplayMemory` (memory.py:12-68):
ring writes with trajectory counting, uniform sampling that excludes the
most recent write, absorbing-state wrapping (rewrite the just-written
terminal transition to point at the absorbing state and append an
absorbing->absorbing self-loop, memory.py:65-68), expert-transition
ingestion (memory.py:18-23) and expert->agent transfer (memory.py:46-48).

TPU-native design: the buffer is a pytree of device arrays living in HBM;
all operations are pure functions safe under jit/donation. Batched appends
from N vectorised envs are ONE fused scatter per column: each incoming
transition expands to two candidate rows (the possibly-rewritten transition
plus the absorbing self-loop), invalid rows get an out-of-range index and
are dropped by the scatter (`mode='drop'`), so shapes stay static and no
per-element Python loop exists.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from iltpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class ReplayState:
    step: jax.Array  # f32 (size,)
    states: jax.Array  # f32 (size, S)
    actions: jax.Array  # f32 (size, A)
    rewards: jax.Array  # f32 (size,)
    next_states: jax.Array  # f32 (size, S)
    terminals: jax.Array  # f32 (size,)
    timeouts: jax.Array  # f32 (size,)
    weights: jax.Array  # f32 (size,)
    idx: jax.Array  # i32 scalar: next write position
    full: jax.Array  # bool scalar: has the ring wrapped
    num_trajectories: jax.Array  # i32 scalar
    size: int = static_field()
    absorbing: bool = static_field()


def replay_init(
    size: int, state_size: int, action_size: int, absorbing: bool
) -> ReplayState:
    f = jnp.zeros
    return ReplayState(
        step=f((size,), jnp.float32),
        states=f((size, state_size), jnp.float32),
        actions=f((size, action_size), jnp.float32),
        rewards=f((size,), jnp.float32),
        next_states=f((size, state_size), jnp.float32),
        terminals=f((size,), jnp.float32),
        timeouts=f((size,), jnp.float32),
        weights=f((size,), jnp.float32),
        idx=jnp.zeros((), jnp.int32),
        full=jnp.zeros((), jnp.bool_),
        num_trajectories=jnp.zeros((), jnp.int32),
        size=size,
        absorbing=absorbing,
    )


def replay_from_transitions(
    transitions: Dict[str, jax.Array], num_trajectories: int, absorbing: bool
) -> ReplayState:
    """Expert-memory constructor (memory.py:18-23): buffer sized to the
    dataset, step column = 1..N, marked full."""
    n = int(transitions["states"].shape[0])
    state = ReplayState(
        step=jnp.arange(1, n + 1, dtype=jnp.float32),
        states=jnp.asarray(transitions["states"], jnp.float32),
        actions=jnp.asarray(transitions["actions"], jnp.float32),
        rewards=jnp.asarray(transitions["rewards"], jnp.float32),
        next_states=jnp.asarray(transitions["next_states"], jnp.float32),
        terminals=jnp.asarray(transitions["terminals"], jnp.float32),
        timeouts=jnp.asarray(transitions["timeouts"], jnp.float32),
        weights=jnp.asarray(transitions["weights"], jnp.float32),
        idx=jnp.zeros((), jnp.int32),  # wrapped exactly once
        full=jnp.ones((), jnp.bool_),
        num_trajectories=jnp.asarray(num_trajectories, jnp.int32),
        size=n,
        absorbing=absorbing,
    )
    return state


def _absorbing_state(state_size: int) -> jax.Array:
    """All-zeros with the trailing indicator bit set (memory.py:66)."""
    return jnp.zeros((state_size,), jnp.float32).at[-1].set(1.0)


def replay_append_batch(
    rs: ReplayState,
    step: jax.Array,  # i32/f32 (N,) global env-step of each transition
    states: jax.Array,  # (N, S)
    actions: jax.Array,  # (N, A)
    rewards: jax.Array,  # (N,)
    next_states: jax.Array,  # (N, S)
    terminals: jax.Array,  # (N,) bool: true termination (excludes timeouts)
    timeouts: jax.Array,  # (N,) bool: episode hit the time limit
    valid: Optional[jax.Array] = None,  # (N,) bool: mask for ragged batches
) -> ReplayState:
    """Fused ring append of N transitions with inline absorbing wrapping.

    Semantics per element match `append` (memory.py:40-44) followed by
    `wrap_for_absorbing_states` (memory.py:65-68) when the buffer is
    absorbing and the element is a true (non-timeout) termination:
    the transition is stored with next_state := absorbing_state and
    terminal := 0, and an absorbing self-loop row is appended after it.
    """
    n = states.shape[0]
    s_dim = rs.states.shape[1]
    terminals = terminals.astype(jnp.bool_)
    timeouts = timeouts.astype(jnp.bool_)
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    valid = valid.astype(jnp.bool_)
    terminals &= valid
    timeouts &= valid

    wrap = terminals if rs.absorbing else jnp.zeros_like(terminals)
    absorbing_state = _absorbing_state(s_dim)

    # Row A: the incoming transition, rewritten if wrapping.
    a_next = jnp.where(wrap[:, None], absorbing_state[None, :], next_states)
    a_term = jnp.where(wrap, 0.0, terminals.astype(jnp.float32))

    # Row B: absorbing self-loop (only valid when wrapping).
    b_states = jnp.broadcast_to(absorbing_state, (n, s_dim))
    b_actions = jnp.zeros_like(actions)

    # Interleave rows [A_0, B_0, A_1, B_1, ...] so each self-loop directly
    # follows its transition, matching the reference ring order.
    rows_valid = jnp.stack([valid, wrap], axis=1).reshape(-1)  # (2N,)
    # Ring offsets: position of each valid row = idx + (#valid rows before it).
    offsets = jnp.cumsum(rows_valid.astype(jnp.int32)) - 1
    write_idx = (rs.idx + offsets) % rs.size
    write_idx = jnp.where(rows_valid, write_idx, rs.size)  # invalid -> dropped

    def interleave_2d(a, b):
        return jnp.stack([a, b], axis=1).reshape(2 * n, -1)

    def interleave_1d(a, b):
        return jnp.stack([a, b], axis=1).reshape(-1)

    stepf = step.astype(jnp.float32)
    zeros_n = jnp.zeros((n,), jnp.float32)
    ones_n = jnp.ones((n,), jnp.float32)

    new = rs.replace(
        step=rs.step.at[write_idx].set(interleave_1d(stepf, stepf), mode="drop"),
        states=rs.states.at[write_idx].set(interleave_2d(states, b_states), mode="drop"),
        actions=rs.actions.at[write_idx].set(
            interleave_2d(actions, b_actions), mode="drop"
        ),
        rewards=rs.rewards.at[write_idx].set(
            interleave_1d(rewards, zeros_n), mode="drop"
        ),
        next_states=rs.next_states.at[write_idx].set(
            interleave_2d(a_next, b_states), mode="drop"
        ),
        terminals=rs.terminals.at[write_idx].set(
            interleave_1d(a_term, zeros_n), mode="drop"
        ),
        timeouts=rs.timeouts.at[write_idx].set(
            interleave_1d(timeouts.astype(jnp.float32), zeros_n), mode="drop"
        ),
        weights=rs.weights.at[write_idx].set(interleave_1d(ones_n, ones_n), mode="drop"),
    )
    count = jnp.sum(rows_valid.astype(jnp.int32))
    new_idx = (rs.idx + count) % rs.size
    became_full = rs.full | (rs.idx + count >= rs.size)
    episode_ends = jnp.sum((terminals | timeouts).astype(jnp.int32))
    return new.replace(
        idx=new_idx,
        full=became_full,
        num_trajectories=rs.num_trajectories + episode_ends,
    )


def replay_sample(rs: ReplayState, key: jax.Array, n: int) -> Dict[str, jax.Array]:
    """Uniform sample of n transitions, never crossing the write head.

    Matches `_sample_idx`/`sample` (memory.py:51-63): when not full, sample
    uniformly from [0, idx-2]; when full, uniformly over all slots except
    (idx-1) mod size. The `absorbing` flag is derived from the trailing
    state bit (memory.py:62).
    """
    limit = jnp.where(rs.full, rs.size - 1, jnp.maximum(rs.idx - 1, 1))
    r = jax.random.randint(key, (n,), 0, limit)
    forbidden = (rs.idx - 1) % rs.size
    idxs = jnp.where(rs.full, r + (r >= forbidden), r)
    batch = {
        "step": rs.step[idxs],
        "states": rs.states[idxs],
        "actions": rs.actions[idxs],
        "rewards": rs.rewards[idxs],
        "next_states": rs.next_states[idxs],
        "terminals": rs.terminals[idxs],
        "timeouts": rs.timeouts[idxs],
        "weights": rs.weights[idxs],
    }
    if rs.absorbing:
        batch["absorbing"] = batch["states"][:, -1]
    else:
        batch["absorbing"] = jnp.zeros_like(batch["terminals"])
    return batch


def replay_transfer(dst: ReplayState, src: ReplayState) -> ReplayState:
    """Prefill: append every transition of `src` into `dst` with weight 1
    (memory.py:46-48 — weights are dropped by the reference transfer too).

    The source is an expert buffer whose data is already absorbing-wrapped,
    so rows are copied verbatim (no re-wrapping) via one masked scatter.
    """
    n = src.size
    offsets = jnp.arange(n, dtype=jnp.int32)
    write_idx = (dst.idx + offsets) % dst.size
    in_range = offsets < jnp.asarray(min(n, dst.size), jnp.int32)
    write_idx = jnp.where(in_range, write_idx, dst.size)
    new = dst.replace(
        step=dst.step.at[write_idx].set(src.step, mode="drop"),
        states=dst.states.at[write_idx].set(src.states, mode="drop"),
        actions=dst.actions.at[write_idx].set(src.actions, mode="drop"),
        rewards=dst.rewards.at[write_idx].set(src.rewards, mode="drop"),
        next_states=dst.next_states.at[write_idx].set(src.next_states, mode="drop"),
        terminals=dst.terminals.at[write_idx].set(src.terminals, mode="drop"),
        timeouts=dst.timeouts.at[write_idx].set(src.timeouts, mode="drop"),
        weights=dst.weights.at[write_idx].set(jnp.ones_like(src.weights), mode="drop"),
    )
    count = jnp.asarray(min(n, dst.size), jnp.int32)
    episode_ends = jnp.sum(
        ((src.terminals > 0) | (src.timeouts > 0)).astype(jnp.int32)
    )
    return new.replace(
        idx=(dst.idx + count) % dst.size,
        full=dst.full | (dst.idx + count >= dst.size),
        num_trajectories=dst.num_trajectories + episode_ends,
    )
