from iltpu.envs.scores import ENVS, SPECS, EnvSpec, d4rl_normalized_score
from iltpu.envs.host import HostVecEnv, evaluate_policy
from iltpu.envs.jaxenv import StepOut, VecEnv, VecEnvState
from iltpu.envs.classic import JAX_ENVS, Pendulum, PointMass2D
from iltpu.envs.native import NativeVecEnv, native_available

__all__ = [
    "NativeVecEnv",
    "native_available",
    "ENVS",
    "SPECS",
    "EnvSpec",
    "d4rl_normalized_score",
    "HostVecEnv",
    "evaluate_policy",
    "VecEnv",
    "VecEnvState",
    "StepOut",
    "JAX_ENVS",
    "Pendulum",
    "PointMass2D",
]
