"""Tanh-Gaussian policy (SoftActor) + DRIL MC-dropout uncertainty head.

Capability parity with reference `SoftActor` (models.py:84-120):
- MLP trunk producing (mean, log_std) chunks, log_std clamped to [-20, 2];
- tanh-squashed Gaussian with exact cached log-probs;
- greedy action = tanh(mean);
- the same network doubles as the DRIL "discriminator": a Monte-Carlo
  dropout ensemble of size 5 whose action-probability variance is the
  uncertainty cost, thresholded at a quantile of the expert data
  (models.py:104-120). Ensemble members use independent PRNG-split dropout
  masks per sample, matching torch's per-element dropout.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from iltpu.models import distributions as D
from iltpu.models.fcnn import MLP, Params

DRIL_ENSEMBLE_SIZE = 5  # models.py:105


class SoftActor:
    def __init__(
        self,
        state_size: int,
        action_size: int,
        hidden_size: int = 256,
        depth: int = 2,
        activation: str = "relu",
        input_dropout: float = 0.0,
        dropout: float = 0.0,
    ):
        self.state_size = state_size
        self.action_size = action_size
        self.net = MLP(
            state_size,
            hidden_size,
            depth,
            2 * action_size,
            activation,
            input_dropout=input_dropout,
            dropout=dropout,
        )

    def init(self, key: jax.Array) -> Params:
        return self.net.init(key)

    def dist(
        self,
        params: Params,
        state: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        out = self.net.apply(params, state, rng=rng, train=train)
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, D.LOG_STD_MIN, D.LOG_STD_MAX)
        return mean, log_std

    def sample(
        self, params: Params, key: jax.Array, state: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (action, log_prob); reparameterised, so differentiable."""
        mean, log_std = self.dist(params, state)
        z = D.sample_pretanh(key, mean, log_std)
        action = jnp.tanh(z)
        return action, D.log_prob_from_pretanh(mean, log_std, z)

    def log_prob(
        self,
        params: Params,
        state: jax.Array,
        action: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        mean, log_std = self.dist(params, state, rng=rng, train=train)
        return D.log_prob_of_action(mean, log_std, action)

    def greedy_action(self, params: Params, state: jax.Array) -> jax.Array:
        mean, _ = self.dist(params, state)
        return jnp.tanh(mean)

    # --- DRIL MC-dropout ensemble -------------------------------------------

    def action_uncertainty(
        self, params: Params, key: jax.Array, state: jax.Array, action: jax.Array
    ) -> jax.Array:
        """Variance of pi(a|s) across 5 independent dropout forwards
        (models.py:104-107)."""
        keys = jax.random.split(key, DRIL_ENSEMBLE_SIZE)

        def member(k):
            return jnp.exp(
                self.log_prob(params, state, action, rng=k, train=True)
            )

        probs = jax.vmap(member)(keys)  # (ensemble, batch)
        return jnp.var(probs, axis=0, ddof=1)  # torch .var default: unbiased

    def uncertainty_threshold(
        self,
        params: Params,
        key: jax.Array,
        expert_state: jax.Array,
        expert_action: jax.Array,
        quantile_cutoff: float,
    ) -> jax.Array:
        """98th-quantile threshold over expert data (models.py:110-111)."""
        u = self.action_uncertainty(params, key, expert_state, expert_action)
        return jnp.quantile(u, quantile_cutoff)

    def dril_reward(
        self,
        params: Params,
        key: jax.Array,
        state: jax.Array,
        action: jax.Array,
        threshold: jax.Array,
    ) -> jax.Array:
        """+1 where uncertainty <= threshold else -1 (models.py:113-120,
        note the final negation: reward = -cost)."""
        u = self.action_uncertainty(params, key, state, action)
        return jnp.where(u <= threshold, 1.0, -1.0)
