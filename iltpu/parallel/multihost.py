"""Multi-host initialisation + cross-process utilities.

The reference has no distributed runtime at all (SURVEY.md §2.3); this is
the TPU-native multi-host layer: `jax.distributed.initialize` connects the
per-host processes, after which the SAME mesh/sharding code in
`iltpu.parallel.data` spans hosts — XLA routes the gradient all-reduce over
ICI within a slice and DCN across slices. Env stepping stays host-local
(each process owns `num_envs` envs feeding its addressable shard); metric
scalars are combined with `process_allreduce_mean`.

On CPU it works the same way with `jax_num_cpu_devices` per process, which
is how the tests exercise a genuine 2-process collective without TPU pods.
"""

import os
from typing import Optional

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Connect this process to the job. Arguments default to the standard
    env vars (JAX_COORDINATOR_ADDRESS etc. / TPU metadata on real pods —
    `jax.distributed.initialize()` autodetects on Cloud TPU). Returns a
    summary dict."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def process_allreduce_mean(x) -> np.ndarray:
    """Mean of a host scalar/array across processes (e.g. eval returns),
    via a tiny device all-reduce on the global mesh."""
    from jax.experimental.multihost_utils import process_allgather

    gathered = process_allgather(np.asarray(x))
    return np.mean(gathered, axis=0)
