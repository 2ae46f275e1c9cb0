"""Test harness: force a pure-CPU JAX with an 8-device virtual mesh so
sharding/psum paths run in CI without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin (when present) programmatically sets
jax_platforms='axon,cpu' at interpreter startup, so the JAX_PLATFORMS env
var alone is not enough — we override via jax.config before any backend
is initialised (backend init is lazy, so this is safe in conftest).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
