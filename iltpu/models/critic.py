"""Q-networks: single critic, twin critic, target-network helpers.

Parity with reference `Critic`/`TwinCritic` (models.py:123-141) and the
target-network utilities (models.py:72-81). Target networks are just a
second params pytree; the Polyak update is a fused tree_map that XLA compiles
into one elementwise pass over HBM.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from iltpu.models.fcnn import MLP, Params


class Critic:
    def __init__(
        self,
        state_size: int,
        action_size: int,
        hidden_size: int = 256,
        depth: int = 2,
        activation: str = "relu",
    ):
        self.net = MLP(state_size + action_size, hidden_size, depth, 1, activation)

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def apply(self, params: Params, state: jax.Array, action: jax.Array) -> jax.Array:
        x = jnp.concatenate([state, action], axis=-1)
        return self.net.apply(params, x)[..., 0]


class TwinCritic:
    """Two independent Q-networks (models.py:133-141) held as ONE stacked
    params pytree: every leaf has a leading (2,) axis and `apply` vmaps over
    it, so both critics run as single batched matmuls (half the op count,
    double the MXU tile occupancy vs two separate networks)."""

    def __init__(self, state_size: int, action_size: int, **kwargs):
        self.critic = Critic(state_size, action_size, **kwargs)

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        p1, p2 = self.critic.init(k1), self.critic.init(k2)
        return jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)

    def apply(
        self, params: Params, state: jax.Array, action: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        qs = jax.vmap(self.critic.apply, in_axes=(0, None, None))(
            params, state, action
        )
        return qs[0], qs[1]


def create_target_params(params: Params) -> Params:
    """Deep copy of the online params (models.py:72-76).

    Must be a real buffer copy, not an identity map: the trainer donates the
    whole state pytree at the jit boundary, and aliased leaves (same buffer at
    two tree positions) make XLA reject the donation.
    """
    return jax.tree.map(jnp.copy, params)


def polyak_update(params: Params, target_params: Params, polyak_factor: float) -> Params:
    """target <- rho * target + (1 - rho) * online (models.py:79-81)."""
    return jax.tree.map(
        lambda t, p: polyak_factor * t + (1.0 - polyak_factor) * p,
        target_params,
        params,
    )
