from iltpu.models.fcnn import MLP, update_spectral_norm
from iltpu.models.actor import SoftActor
from iltpu.models.critic import Critic, TwinCritic, create_target_params, polyak_update

__all__ = [
    "MLP",
    "update_spectral_norm",
    "SoftActor",
    "Critic",
    "TwinCritic",
    "create_target_params",
    "polyak_update",
]
