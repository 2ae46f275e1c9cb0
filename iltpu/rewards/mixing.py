"""Expert/agent batch mixing (reference `mix_expert_agent_transitions`,
models.py:287-290): replace the first half of the batch with expert data."""

from typing import Dict

import jax.numpy as jnp


def mix_expert_agent_transitions(
    transitions: Dict, expert_transitions: Dict
) -> Dict:
    batch_size = transitions["rewards"].shape[0]
    is_expert_row = jnp.arange(batch_size) < batch_size // 2
    out = {}
    for key in transitions:
        mask = is_expert_row
        if transitions[key].ndim == 2:
            mask = mask[:, None]
        out[key] = jnp.where(mask, expert_transitions[key], transitions[key])
    return out
