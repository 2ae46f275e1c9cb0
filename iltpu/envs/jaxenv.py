"""Pure-JAX environment interface: envs that live INSIDE the jit boundary.

This is the TPU-native counterpart of the reference's host env adapter
(environments.py:20-61): instead of a Python<->C round-trip per step
(train.py:153), a JaxEnv's `reset`/`step` are pure functions over an
explicit state pytree, so the whole interact-and-learn loop compiles into
one XLA program and `vmap` scales to thousands of parallel envs per chip.
MJX models plug in behind this same interface when available.

`VecEnv` layers the framework semantics on a raw JaxEnv, all functionally:
- N-way vmap;
- per-env auto-reset (fresh PRNG-derived initial state on termination);
- time-limit truncation with the reference's terminal/timeout split
  (train.py:157: a time-limit end is a timeout, not a terminal);
- DAC absorbing indicator bit appended to observations
  (environments.py:27,32,39);
- action clipping to the env's bounds (environments.py:36).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from iltpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class VecEnvState:
    inner: object  # per-env pytree of the raw env, leading dim N
    t: jax.Array  # i32 (N,) steps into the current episode
    key: jax.Array  # PRNG carry for auto-resets
    obs: jax.Array  # (N, S[+1]) what the policy acts on next


@pytree_dataclass
class StepOut:
    next_obs: jax.Array  # (N, S[+1]) true successor (pre-reset) for replay
    reward: jax.Array  # (N,)
    terminal: jax.Array  # (N,) true termination, excludes timeouts
    timeout: jax.Array  # (N,) time-limit truncation
    done: jax.Array  # (N,) terminal | timeout (episode boundary)


class VecEnv:
    """Functional vectorised wrapper over a raw JaxEnv.

    The raw env must provide: `obs_size`, `action_size`, `action_low`,
    `action_high`, `max_episode_steps`, `reset(key) -> (state, obs)`,
    `step(state, action) -> (state, obs, reward, terminated)`.
    """

    def __init__(self, env, num_envs: int, *, absorbing: bool = True):
        self.env = env
        self.num_envs = num_envs
        self.absorbing = absorbing

    @property
    def obs_size(self) -> int:
        return self.env.obs_size + (1 if self.absorbing else 0)

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def max_episode_steps(self) -> int:
        return self.env.max_episode_steps

    def _augment(self, obs: jax.Array) -> jax.Array:
        if self.absorbing:
            zero = jnp.zeros((*obs.shape[:-1], 1), obs.dtype)
            obs = jnp.concatenate([obs, zero], axis=-1)
        return obs

    def reset(self, key: jax.Array) -> VecEnvState:
        key, sub = jax.random.split(key)
        inner, obs = jax.vmap(self.env.reset)(
            jax.random.split(sub, self.num_envs)
        )
        return VecEnvState(
            inner=inner,
            t=jnp.zeros((self.num_envs,), jnp.int32),
            key=key,
            obs=self._augment(obs),
        )

    def step(
        self, state: VecEnvState, action: jax.Array
    ) -> Tuple[VecEnvState, StepOut]:
        action = jnp.clip(action, self.env.action_low, self.env.action_high)
        inner, obs, reward, terminated = jax.vmap(self.env.step)(
            state.inner, action
        )
        t = state.t + 1
        timeout = t >= self.env.max_episode_steps
        # Timeout takes priority over termination on the same step
        # (train.py:157 stores `terminal and t != max_episode_steps`).
        terminal = jnp.logical_and(terminated, jnp.logical_not(timeout))
        done = jnp.logical_or(terminated, timeout)

        key, sub = jax.random.split(state.key)
        fresh_inner, fresh_obs = jax.vmap(self.env.reset)(
            jax.random.split(sub, self.num_envs)
        )

        def pick(new, old):
            mask = done.reshape(done.shape + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        next_inner = jax.tree.map(pick, fresh_inner, inner)
        next_policy_obs = self._augment(jnp.where(done[:, None], fresh_obs, obs))
        new_state = VecEnvState(
            inner=next_inner,
            t=jnp.where(done, 0, t),
            key=key,
            obs=next_policy_obs,
        )
        out = StepOut(
            next_obs=self._augment(obs),
            reward=reward,
            terminal=terminal.astype(jnp.float32),
            timeout=timeout.astype(jnp.float32),
            done=done,
        )
        return new_state, out
