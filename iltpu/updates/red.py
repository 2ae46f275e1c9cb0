"""RED pretraining: regress the predictor onto the frozen random target.

Parity with reference `target_estimation_update` (training.py:68-75):
loss = mean(w * mean_dim((pred - target)^2)). Only the predictor params
receive gradients; the target stays frozen.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from iltpu.rewards.red import REDDiscriminator, REDState


def target_estimation_update(
    red_module: REDDiscriminator,
    red: REDState,
    opt_state: tuple,
    optim: optax.GradientTransformation,
    expert_transitions: Dict[str, jax.Array],
    *,
    rng: Optional[jax.Array] = None,
    train_dropout: bool = True,
) -> Tuple[REDState, tuple, jax.Array]:
    s = expert_transitions["states"]
    a = expert_transitions["actions"]
    w = expert_transitions["weights"]

    def loss_fn(predictor_params):
        pred, tgt = red_module.forward(
            red.replace(predictor=predictor_params), s, a, rng=rng,
            train=train_dropout,
        )
        return jnp.mean(w * jnp.mean((pred - tgt) ** 2, axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(red.predictor)
    updates, new_opt = optim.update(grads, opt_state, red.predictor)
    new_predictor = optax.apply_updates(red.predictor, updates)
    return red.replace(predictor=new_predictor), new_opt, loss
