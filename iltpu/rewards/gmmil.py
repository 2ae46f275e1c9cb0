"""GMMIL: non-parametric MMD-witness reward.

Capability parity with reference `GMMILDiscriminator` (models.py:183-201):
reward = (weighted kernel similarity to expert) - (self-similarity), summed
over two Gaussian bandwidths set ONCE by the weighted-median heuristic on
the first batch (agent<->expert and expert<->expert medians). The one-time
initialisation is a `lax.cond` over a carried state so the whole reward
remains a single jitted function.

All pairwise distances route through the centered-Gram `squared_distance`
(one MXU matmul) instead of a broadcasted (B, B, d) tensor.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from iltpu.ops.pairwise import squared_distance, weighted_median, weighted_similarity
from iltpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class GMMILState:
    gamma_1: jax.Array  # f32 scalar
    gamma_2: jax.Array  # f32 scalar
    initialized: jax.Array  # bool scalar


class GMMILDiscriminator:
    def __init__(
        self,
        state_size: int,
        action_size: int,
        *,
        state_only: bool = False,
        use_pallas: bool | str = "auto",
    ):
        self.state_only = state_only
        if use_pallas == "auto":
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas)

    def init(self) -> GMMILState:
        return GMMILState(
            gamma_1=jnp.ones((), jnp.float32),
            gamma_2=jnp.ones((), jnp.float32),
            initialized=jnp.zeros((), jnp.bool_),
        )

    def _atoms(self, state: jax.Array, action: jax.Array) -> jax.Array:
        return state if self.state_only else jnp.concatenate([state, action], axis=-1)

    def predict_reward(
        self,
        carry: GMMILState,
        state: jax.Array,
        action: jax.Array,
        expert_state: jax.Array,
        expert_action: jax.Array,
        weight: jax.Array,
        expert_weight: jax.Array,
    ) -> Tuple[GMMILState, jax.Array]:
        sa = self._atoms(state, action)
        esa = self._atoms(expert_state, expert_action)

        def init_gammas(_):
            # Median-heuristic bandwidths need the full distance matrices —
            # computed only inside this one-time branch so the steady-state
            # Pallas path never materialises them.
            d2_ae_i = squared_distance(sa, esa)
            d2_ee = squared_distance(esa, esa)
            g1 = 1.0 / (
                weighted_median(d2_ae_i, jnp.outer(weight, expert_weight)) + 1e-8
            )
            g2 = 1.0 / (
                weighted_median(d2_ee, jnp.outer(expert_weight, expert_weight)) + 1e-8
            )
            return g1, g2

        gamma_1, gamma_2 = jax.lax.cond(
            carry.initialized,
            lambda _: (carry.gamma_1, carry.gamma_2),
            init_gammas,
            operand=None,
        )
        new_carry = GMMILState(
            gamma_1=gamma_1, gamma_2=gamma_2, initialized=jnp.ones((), jnp.bool_)
        )

        if self.use_pallas:
            # Fused tiled kernel: distances + both Gaussian kernels +
            # weighted row sums without writing the (B, E)/(B, B) matrices
            # to HBM (iltpu.ops.pallas_pairwise).
            from iltpu.ops.pallas_pairwise import gmmil_witness_reward

            reward = gmmil_witness_reward(
                sa, esa, weight, expert_weight, gamma_1, gamma_2
            )
            return new_carry, reward

        d2_ae = squared_distance(sa, esa)
        d2_aa = squared_distance(sa, sa)
        w_norm = weight / weight.sum()
        ew_norm = expert_weight / expert_weight.sum()
        similarity = weighted_similarity(d2_ae, w_norm, ew_norm, gamma_1) + (
            weighted_similarity(d2_ae, w_norm, ew_norm, gamma_2)
        )
        self_similarity = weighted_similarity(d2_aa, w_norm, w_norm, gamma_1) + (
            weighted_similarity(d2_aa, w_norm, w_norm, gamma_2)
        )
        return new_carry, similarity - self_similarity
