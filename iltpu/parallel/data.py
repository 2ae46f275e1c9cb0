"""Data-parallel scaling over a `jax.sharding.Mesh`.

The reference has NO distributed communication at all (SURVEY.md §2.3); this
module is the TPU-native scaling layer the build plan calls for: pick a
mesh, annotate shardings, and let XLA insert the collectives (psum
all-reduce of gradients over ICI) — the GSPMD recipe, not hand-written
NCCL/MPI.

Training-state leaves are replicated; sampled transition batches are
sharded over the leading (batch) dimension via `with_sharding_constraint`
inside the jitted update. Every mean-reduced loss then produces partial
sums per device and one XLA-inserted all-reduce per gradient — no changes
to the update rules themselves.

Multi-host: `jax.distributed.initialize()` before building the mesh makes
the same code span hosts (ICI within a slice, DCN across); tests exercise
the collective paths on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count, SURVEY.md §4).
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first `num_devices` devices (all by
    default)."""
    devices = jax.devices()
    if num_devices is not None:
        assert num_devices <= len(devices), (
            f"requested {num_devices} devices, have {len(devices)}"
        )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Constrain every leaf of a transitions pytree to be sharded over its
    leading dimension. Used INSIDE jit: downstream elementwise/matmul work
    then runs fully parallel and XLA all-reduces the loss/grad reductions."""
    sharding = NamedSharding(mesh, P(axis))

    def constrain(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.lax.with_sharding_constraint(x, sharding)
        return x

    return jax.tree.map(constrain, batch)


def param_shardings(mesh: Mesh, params: Any, axis: str = "data") -> Any:
    """Tensor-parallel sharding specs for a params pytree.

    The reference has no TP and these MLPs (≤256 wide) don't need it
    (SURVEY.md §2.3), but the rules are exposed anyway: every weight with
    ndim >= 2 shards its LAST axis over `axis` (the Megatron column-parallel
    analogue for MLP hidden dims) when it divides the mesh; everything else
    (biases, optimiser scalars, flat optimiser vectors) replicates. Annotate
    the initial params with `jax.device_put(params, param_shardings(...))`
    and GSPMD propagates the layout through the jitted update, inserting the
    collectives.
    """
    n = mesh.shape[axis]

    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim >= 2 and leaf.shape[-1] % n == 0 and leaf.shape[-1] >= n:
            return NamedSharding(mesh, P(*([None] * (ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
