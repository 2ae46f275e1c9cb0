from iltpu.updates.sac import SACLearner, SACState
from iltpu.updates.bc import behavioural_cloning_update
from iltpu.updates.red import target_estimation_update
from iltpu.updates.adversarial import AdversarialConfig, adversarial_imitation_update

__all__ = [
    "SACLearner",
    "SACState",
    "behavioural_cloning_update",
    "target_estimation_update",
    "AdversarialConfig",
    "adversarial_imitation_update",
]
