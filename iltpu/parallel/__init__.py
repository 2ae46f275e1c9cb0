from iltpu.parallel.data import (
    batch_sharding,
    constrain_batch,
    make_mesh,
    param_shardings,
    replicated_sharding,
)
from iltpu.parallel.multihost import initialize_multihost, process_allreduce_mean

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "constrain_batch",
    "param_shardings",
    "initialize_multihost",
    "process_allreduce_mean",
]
