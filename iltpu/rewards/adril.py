"""AdRIL / SQIL reward relabelling.

Capability parity with reference `RewardRelabeller` (models.py:293-318):
- balanced mode: alternate whole batches of pure expert / pure policy data
  (the flip is carried state);
- unbalanced mode: replace the first half of the batch with expert data;
- AdRIL (update_freq > 0): expert reward +1/|expert trajectories|; policy
  reward 0 for the current round and -1/max(|trajectories|, 1) for stale
  rounds, where round = ceil(step / update_freq) compared against the stored
  per-transition step column (models.py:312-315);
- SQIL (update_freq == 0): +1 expert / 0 policy.

Functional form: in-place index assignment becomes a masked select over the
batch — one fused `where` per column.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from iltpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class RelabellerState:
    sample_expert: jax.Array  # bool scalar — balanced-mode flip


def init_relabeller() -> RelabellerState:
    return RelabellerState(sample_expert=jnp.ones((), jnp.bool_))


def resample_and_relabel(
    carry: RelabellerState,
    transitions: Dict[str, jax.Array],
    expert_transitions: Dict[str, jax.Array],
    step: jax.Array,
    num_trajectories: jax.Array,
    num_expert_trajectories: jax.Array,
    *,
    update_freq: int,
    balanced: bool,
) -> Tuple[RelabellerState, Dict[str, jax.Array]]:
    batch_size = transitions["rewards"].shape[0]
    if balanced:
        is_expert_row = jnp.broadcast_to(carry.sample_expert, (batch_size,))
        new_carry = RelabellerState(sample_expert=~carry.sample_expert)
    else:
        is_expert_row = jnp.arange(batch_size) < batch_size // 2
        new_carry = carry

    out = {}
    for key in transitions:
        mask = is_expert_row
        if transitions[key].ndim == 2:
            mask = mask[:, None]
        out[key] = jnp.where(mask, expert_transitions[key], transitions[key])

    if update_freq > 0:  # AdRIL
        expert_reward = 1.0 / num_expert_trajectories.astype(jnp.float32)
        round_num = jnp.ceil(step / update_freq)
        stale = round_num > jnp.ceil(out["step"] / update_freq)
        policy_reward = (
            -1.0
            * stale.astype(jnp.float32)
            / jnp.maximum(num_trajectories.astype(jnp.float32), 1.0)
        )
    else:  # SQIL
        expert_reward = jnp.ones((), jnp.float32)
        policy_reward = jnp.zeros((batch_size,), jnp.float32)

    out["rewards"] = jnp.where(is_expert_row, expert_reward, policy_reward)
    return new_carry, out
