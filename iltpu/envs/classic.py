"""Analytic pure-JAX environments (in-jit path, tests, benchmarks).

These give the framework a fully on-device training path today — MJX slots
in behind the same `iltpu.envs.jaxenv` interface when available. Dynamics
are simple enough to be exactly unit-testable, and both exercise the parts
of the framework the MuJoCo envs do: bounded actions, reward shaping, and
(for PointMass) true termination so the DAC absorbing machinery runs.
"""

import jax
import jax.numpy as jnp

from iltpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class PendulumState:
    theta: jax.Array  # ()
    theta_dot: jax.Array  # ()


class Pendulum:
    """Classic torque-limited swing-up; no termination (timeout-only env)."""

    obs_size = 3
    action_size = 1
    action_low = -2.0
    action_high = 2.0
    max_episode_steps = 200
    # Score-normalisation anchors (random policy / near-optimal policy),
    # playing the role of the D4RL ref scores for the MuJoCo envs.
    ref_min_score = -1200.0
    ref_max_score = -130.0

    g, m, l, dt = 10.0, 1.0, 1.0, 0.05
    max_speed = 8.0

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = PendulumState(theta=theta, theta_dot=theta_dot)
        return state, self._obs(state)

    def _obs(self, s):
        return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot])

    def step(self, s, action):
        u = jnp.clip(action[0], self.action_low, self.action_high)
        angle = jnp.mod(s.theta + jnp.pi, 2 * jnp.pi) - jnp.pi
        cost = angle**2 + 0.1 * s.theta_dot**2 + 0.001 * u**2
        theta_dot = s.theta_dot + (
            3 * self.g / (2 * self.l) * jnp.sin(s.theta)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        theta_dot = jnp.clip(theta_dot, -self.max_speed, self.max_speed)
        theta = s.theta + theta_dot * self.dt
        new = PendulumState(theta=theta, theta_dot=theta_dot)
        return new, self._obs(new), -cost, jnp.zeros((), jnp.bool_)


@pytree_dataclass
class PointMassState:
    pos: jax.Array  # (2,)
    vel: jax.Array  # (2,)


class PointMass2D:
    """Velocity-damped point mass steering to the origin; terminates inside
    the goal radius — exercises true terminals + absorbing wrapping."""

    obs_size = 4
    action_size = 2
    action_low = -1.0
    action_high = 1.0
    max_episode_steps = 100
    ref_min_score = -80.0
    ref_max_score = 5.0

    dt, damping, goal_radius = 0.1, 0.95, 0.1

    def reset(self, key):
        pos = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
        state = PointMassState(pos=pos, vel=jnp.zeros(2))
        return state, self._obs(state)

    def _obs(self, s):
        return jnp.concatenate([s.pos, s.vel])

    def step(self, s, action):
        a = jnp.clip(action, self.action_low, self.action_high)
        vel = self.damping * s.vel + a * self.dt
        pos = s.pos + vel * self.dt
        new = PointMassState(pos=pos, vel=vel)
        dist = jnp.linalg.norm(pos)
        terminated = dist < self.goal_radius
        reward = -dist + jnp.where(terminated, 10.0, 0.0)
        return new, self._obs(new), reward, terminated


JAX_ENVS = {"pendulum": Pendulum, "pointmass": PointMass2D}
