"""RED: Random Expert Distillation (RND-style) reward.

Capability parity with reference `REDDiscriminator` + `EmbeddingNetwork`
(models.py:252-284): a frozen random target network and a trained predictor
of identical (input-sized) output; sigma_1 either from config or via the
kernel-median heuristic on one expert batch (models.py:277-280, driven at
train.py:128); reward = exp(-sigma_1 * MSE(pred, target)) (models.py:282-284).
The predictor may carry input/hidden dropout during pretraining; the target
never does (models.py:253,265-266).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from iltpu.models.fcnn import MLP, Params
from iltpu.ops.pairwise import squared_distance
from iltpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class REDState:
    predictor: Params
    target: Params  # frozen — never passed to an optimiser
    sigma_1: jax.Array  # f32 scalar
    sigma_set: jax.Array  # bool scalar


class REDDiscriminator:
    def __init__(
        self,
        state_size: int,
        action_size: int,
        *,
        state_only: bool = False,
        hidden_size: int = 32,
        depth: int = 1,
        activation: str = "relu",
        input_dropout: float = 0.0,
        dropout: float = 0.0,
        reward_bandwidth_scale: Optional[float] = None,
    ):
        self.state_only = state_only
        in_size = state_size if state_only else state_size + action_size
        self.predictor_net = MLP(
            in_size, hidden_size, depth, in_size, activation,
            input_dropout=input_dropout, dropout=dropout,
        )
        self.target_net = MLP(in_size, hidden_size, depth, in_size, activation)
        self.reward_bandwidth_scale = reward_bandwidth_scale

    def init(self, key: jax.Array) -> REDState:
        kp, kt = jax.random.split(key)
        sigma_given = self.reward_bandwidth_scale is not None
        return REDState(
            predictor=self.predictor_net.init(kp),
            target=self.target_net.init(kt),
            sigma_1=jnp.asarray(
                self.reward_bandwidth_scale if sigma_given else 1.0, jnp.float32
            ),
            sigma_set=jnp.asarray(sigma_given, jnp.bool_),
        )

    def _atoms(self, state: jax.Array, action: jax.Array) -> jax.Array:
        return state if self.state_only else jnp.concatenate([state, action], axis=-1)

    def forward(
        self,
        state_params: REDState,
        state: jax.Array,
        action: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        x = self._atoms(state, action)
        prediction = self.predictor_net.apply(
            state_params.predictor, x, rng=rng, train=train
        )
        target = self.target_net.apply(state_params.target, x)
        return prediction, target

    def set_sigma(
        self, red: REDState, expert_state: jax.Array, expert_action: jax.Array
    ) -> REDState:
        """Kernel-median heuristic on one expert batch unless sigma came
        from config (models.py:276-280)."""

        def compute(_):
            pred, tgt = self.forward(red, expert_state, expert_action)
            return 1.0 / jnp.median(squared_distance(pred, tgt))

        sigma = jax.lax.cond(
            red.sigma_set, lambda _: red.sigma_1, compute, operand=None
        )
        return red.replace(sigma_1=sigma, sigma_set=jnp.ones((), jnp.bool_))

    def predict_reward(
        self, red: REDState, state: jax.Array, action: jax.Array
    ) -> jax.Array:
        pred, tgt = self.forward(red, state, action)
        return jnp.exp(-red.sigma_1 * jnp.mean((pred - tgt) ** 2, axis=-1))
