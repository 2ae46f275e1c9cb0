"""Behavioural-cloning update: weighted maximum likelihood.

Parity with reference `behavioural_cloning_update` (training.py:57-64):
expert actions clamped to (-1, 1) and loss = mean(w * -log pi(a_E | s_E)).
Used for BC pretraining, the DRIL ensemble pretraining, and the per-step
BC auxiliary loss (train.py:96-98,120,201).
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from iltpu.models.actor import SoftActor


def behavioural_cloning_update(
    actor: SoftActor,
    actor_params: dict,
    opt_state: tuple,
    optim: optax.GradientTransformation,
    expert_transitions: Dict[str, jax.Array],
    *,
    rng: Optional[jax.Array] = None,
    train_dropout: bool = False,
) -> Tuple[dict, tuple, jax.Array]:
    """Returns (new_params, new_opt_state, loss).

    `train_dropout=True` enables the actor's dropout layers during the
    forward pass — required for DRIL's MC-dropout ensemble pretraining
    (torch modules default to train mode during pretraining, train.py:120).
    """
    s = expert_transitions["states"]
    a = expert_transitions["actions"]
    w = expert_transitions["weights"]
    # log_prob_of_action clamps internally to (-1 + 1e-6, 1 - 1e-6), matching
    # the reference clamp at training.py:59.

    def loss_fn(params):
        lp = actor.log_prob(params, s, a, rng=rng, train=train_dropout)
        return jnp.mean(w * -lp)

    loss, grads = jax.value_and_grad(loss_fn)(actor_params)
    updates, new_opt = optim.update(grads, opt_state, actor_params)
    new_params = optax.apply_updates(actor_params, updates)
    return new_params, new_opt, loss
