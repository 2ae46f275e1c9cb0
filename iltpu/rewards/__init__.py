from iltpu.rewards.gail import GAILDiscriminator
from iltpu.rewards.gmmil import GMMILDiscriminator, GMMILState
from iltpu.rewards.pwil import PWILDiscriminator, PWILState
from iltpu.rewards.red import REDDiscriminator, REDState
from iltpu.rewards.adril import RelabellerState, init_relabeller, resample_and_relabel
from iltpu.rewards.mixing import mix_expert_agent_transitions

__all__ = [
    "GAILDiscriminator",
    "GMMILDiscriminator",
    "GMMILState",
    "PWILDiscriminator",
    "PWILState",
    "REDDiscriminator",
    "REDState",
    "RelabellerState",
    "init_relabeller",
    "resample_and_relabel",
    "mix_expert_agent_transitions",
]
