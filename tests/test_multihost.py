"""Genuine multi-process collective test: two OS processes, each with 4
virtual CPU devices, form one 8-device global mesh and all-reduce a sharded
gradient through the same sharding code the trainer uses. This is the
"multi-host without a cluster" strategy from SURVEY.md §4."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from iltpu.parallel.multihost import initialize_multihost

info = initialize_multihost(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from iltpu.parallel import batch_sharding, make_mesh

mesh = make_mesh()
assert mesh.devices.size == 8

# Each process owns half of a global (16, 4) batch; the mean-loss gradient
# must equal the single-process value (XLA inserts the cross-host psum).
w = jnp.ones((4, 1))
local = np.full((8, 4), float(sys.argv[2]) + 1.0, np.float32)  # p0: 1s, p1: 2s
from jax.experimental.multihost_utils import host_local_array_to_global_array

global_x = host_local_array_to_global_array(local, mesh, P("data"))


def loss(w, x):
    x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh))
    return jnp.mean(x @ w)


g = jax.jit(
    jax.grad(loss), in_shardings=(NamedSharding(mesh, P()), batch_sharding(mesh))
)(w, global_x)
# grad_j = (1/16) sum_i x_ij = column mean of the GLOBAL batch:
# 8 rows of 1.0 (p0) + 8 rows of 2.0 (p1) -> 1.5 per column.
expect = np.full((4, 1), 1.5)
np.testing.assert_allclose(np.asarray(jax.device_get(g)), expect, rtol=1e-6)
print("WORKER_OK", sys.argv[2])
"""


@pytest.mark.slow
def test_two_process_collective(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
