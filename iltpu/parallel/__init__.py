from iltpu.parallel.data import (
    batch_sharding,
    constrain_batch,
    make_mesh,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "constrain_batch",
]
