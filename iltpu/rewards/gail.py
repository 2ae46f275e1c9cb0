"""GAIL/AIRL/FAIRL discriminator.

Capability parity with reference `GAILDiscriminator` (models.py:152-180):
- state-only option;
- optional AIRL reward shaping f = g(s[,a]) + (1-terminal)(gamma*h(s') - h(s))
  with g a single linear layer and h a full MLP (models.py:157-160);
- optional subtract-log-policy (models.py:175);
- optional spectral norm on every layer (power-iteration step is applied
  explicitly once per optimisation step via `update_spectral_norm`);
- reward heads: GAIL -log(1-D), AIRL log D - log(1-D), FAIRL e^h * (-h),
  each with the 1e-6 numerical-stability epsilon (models.py:177-180).

Note the reference never wires dropout into this discriminator (its
`_create_fcnn` call at models.py:162 passes no dropout args), so neither do
we — the dropout keys in the GAIL config affect only the HP search space.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from iltpu.models.fcnn import MLP, Params, update_spectral_norm


class GAILDiscriminator:
    def __init__(
        self,
        state_size: int,
        action_size: int,
        *,
        state_only: bool = False,
        reward_shaping: bool = False,
        subtract_log_policy: bool = False,
        reward_function: str = "GAIL",
        hidden_size: int = 64,
        depth: int = 1,
        activation: str = "relu",
        spectral_norm: bool = False,
        discount: float = 0.99,
    ):
        assert reward_function in ("AIRL", "FAIRL", "GAIL")
        self.state_only = state_only
        self.reward_shaping = reward_shaping
        self.subtract_log_policy = subtract_log_policy
        self.reward_function = reward_function
        self.discount = discount
        self.spectral_norm = spectral_norm
        in_size = state_size if state_only else state_size + action_size
        if reward_shaping:
            # g is a single linear "reward" head; h is the shaping MLP Phi.
            self.g = MLP(in_size, hidden_size, 0, 1, activation,
                         spectral_norm=spectral_norm)
            self.h = MLP(state_size, hidden_size, depth, 1, activation,
                         spectral_norm=spectral_norm)
        else:
            self.g = MLP(in_size, hidden_size, depth, 1, activation,
                         spectral_norm=spectral_norm)
            self.h = None

    def init(self, key: jax.Array) -> Params:
        kg, kh = jax.random.split(key)
        params = {"g": self.g.init(kg)}
        if self.h is not None:
            params["h"] = self.h.init(kh)
        return params

    def update_sn(self, params: Params) -> Params:
        """One spectral-norm power iteration on every layer; call once per
        discriminator optimisation step."""
        if not self.spectral_norm:
            return params
        out = {"g": update_spectral_norm(params["g"])}
        if self.h is not None:
            out["h"] = update_spectral_norm(params["h"])
        return out

    def _reward(self, params: Params, state: jax.Array, action: jax.Array) -> jax.Array:
        x = state if self.state_only else jnp.concatenate([state, action], axis=-1)
        return self.g.apply(params["g"], x)[..., 0]

    def _value(self, params: Params, state: jax.Array) -> jax.Array:
        return self.h.apply(params["h"], state)[..., 0]

    def forward(
        self,
        params: Params,
        state: jax.Array,
        action: jax.Array,
        next_state: Optional[jax.Array] = None,
        terminal: Optional[jax.Array] = None,
        log_policy: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Discriminator logit f (models.py:173-175)."""
        f = self._reward(params, state, action)
        if self.reward_shaping:
            f = f + (1.0 - terminal) * (
                self.discount * self._value(params, next_state)
                - self._value(params, state)
            )
        if self.subtract_log_policy:
            f = f - log_policy
        return f

    def predict_reward(
        self,
        params: Params,
        state: jax.Array,
        action: jax.Array,
        next_state: Optional[jax.Array] = None,
        terminal: Optional[jax.Array] = None,
        log_policy: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Reward head (models.py:177-180)."""
        D = jax.nn.sigmoid(
            self.forward(params, state, action, next_state, terminal, log_policy)
        )
        if self.reward_function == "GAIL":
            h = -jnp.log1p(-D + 1e-6)
        else:  # AIRL and FAIRL share the AIRL h
            h = jnp.log(D + 1e-6) - jnp.log1p(-D + 1e-6)
        if self.reward_function == "FAIRL":
            return jnp.exp(h) * -h
        return h


def make_gail_input(
    state: jax.Array,
    action: jax.Array,
    next_state: jax.Array,
    terminal: jax.Array,
    actor,
    actor_params,
    reward_shaping: bool,
    subtract_log_policy: bool,
) -> Dict[str, Any]:
    """Reference `make_gail_input` (models.py:145-149): assembles the
    discriminator input dict; the log-policy term is a constant w.r.t. the
    discriminator (built under no_grad in the reference)."""
    inp = {"state": state, "action": action}
    if reward_shaping:
        inp["next_state"] = next_state
        inp["terminal"] = terminal
    if subtract_log_policy:
        inp["log_policy"] = jax.lax.stop_gradient(
            actor.log_prob(actor_params, state, action)
        )
    return inp
