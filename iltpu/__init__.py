"""iltpu — a TPU-native deep imitation-learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
Kaixhin/imitation-learning ("A Pragmatic Look at Deep Imitation Learning",
ACML 2023): SAC backbone plus AdRIL/SQIL, BC, DRIL, GAIL/AIRL/FAIRL, GMMIL,
PWIL and RED imitation algorithms, DAC-style absorbing-state handling, an
HBM-resident ring replay, and data-parallel scaling over `jax.sharding.Mesh`.

Everything on the compute path is a pure, jittable function over explicit
state pytrees; the environment can either live inside the jit boundary
(pure-JAX envs) or on the host (vectorised MuJoCo).
"""

__version__ = "0.1.0"

from iltpu.utils.pytree import pytree_dataclass, static_field

__all__ = ["pytree_dataclass", "static_field", "__version__"]
