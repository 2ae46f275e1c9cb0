from iltpu.data.replay import (
    ReplayState,
    replay_append_batch,
    replay_from_transitions,
    replay_init,
    replay_sample,
    replay_transfer,
)
from iltpu.data.dataset import build_expert_transitions, load_d4rl_hdf5

__all__ = [
    "ReplayState",
    "replay_init",
    "replay_from_transitions",
    "replay_append_batch",
    "replay_sample",
    "replay_transfer",
    "build_expert_transitions",
    "load_d4rl_hdf5",
]
