"""Data-parallel mesh tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharding propagation through the
jitted update, result parity vs single-device, and the driver's multi-chip
dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iltpu.parallel import batch_sharding, constrain_batch, make_mesh


def test_mesh_has_8_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_constrain_batch_shards_leading_dim():
    mesh = make_mesh()
    batch = {
        "states": jnp.zeros((16, 4)),
        "rewards": jnp.zeros((16,)),
        "scalar": jnp.zeros(()),
    }

    @jax.jit
    def f(b):
        b = constrain_batch(b, mesh)
        return jax.tree.map(lambda x: x * 2, b)

    out = f(batch)
    shard_shapes = [s.data.shape for s in out["states"].addressable_shards]
    assert all(shape == (2, 4) for shape in shard_shapes)  # 16 / 8 devices


def test_dp_gradient_matches_single_device():
    """The sharded mean-loss gradient must equal the unsharded one (the
    all-reduce XLA inserts is a true mean)."""
    mesh = make_mesh()
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 1)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(64, 4)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(2).normal(size=(64,)), jnp.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w)[:, 0] * y)

    g_plain = jax.jit(jax.grad(loss))(w, x, y)

    def loss_sharded(w, x, y):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh))
        return loss(w, x, y)

    g_dp = jax.jit(jax.grad(loss_sharded))(w, x, y)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_dp), rtol=1e-6)


def test_trainer_dp_update_runs_on_mesh(tmp_path):
    from iltpu.config import load_config
    from iltpu.trainer import train

    cfg = load_config(
        [
            "algorithm=GAIL",
            "env=pointmass",
            "env_backend=jax",
            "parallel.data_axis=data",
            "steps=200",
            "training.start=100",
            "training.batch_size=32",
            "evaluation.interval=150",
            "evaluation.episodes=2",
            "logging.interval=50",
            "memory.size=500",
            "imitation.trajectories=3",
        ]
    )
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_trainer_dp_rejects_indivisible_batch(tmp_path):
    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    cfg = load_config(
        [
            "algorithm=SAC",
            "env=pointmass",
            "env_backend=jax",
            "parallel.data_axis=data",
            "training.batch_size=30",  # not divisible by 8
        ]
    )
    with pytest.raises(AssertionError):
        Trainer(cfg, str(tmp_path))


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_param_shardings_shard_weight_last_axis():
    from iltpu.models import SoftActor
    from iltpu.parallel import make_mesh, param_shardings

    mesh = make_mesh(axis="data")
    actor = SoftActor(5, 2, hidden_size=32, depth=2)
    params = actor.init(jax.random.key(0))
    specs = param_shardings(mesh, params, "data")
    sharded = jax.device_put(params, specs)
    w = sharded["layers"][0]["w"]  # (5, 32): 32 % 8 == 0 -> sharded
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    b = sharded["layers"][0]["b"]  # 1-D -> replicated
    assert b.sharding.spec == jax.sharding.PartitionSpec()
    # forward under the sharded layout still matches the replicated one
    obs = jax.random.normal(jax.random.key(1), (4, 5))
    np.testing.assert_allclose(
        np.asarray(actor.greedy_action(sharded, obs)),
        np.asarray(actor.greedy_action(params, obs)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_trainer_shard_params_update_runs(tmp_path):
    """Tensor-parallel layout end-to-end: train with parallel.shard_params
    (weights sharded over the 8-device mesh, GSPMD-inserted collectives)."""
    from iltpu.config import load_config
    from iltpu.trainer import train

    cfg = load_config(
        [
            "algorithm=GAIL",
            "env=pointmass",
            "env_backend=jax",
            "parallel.data_axis=data",
            "parallel.shard_params=true",
            "steps=200",
            "training.start=100",
            "training.batch_size=32",
            "evaluation.interval=150",
            "evaluation.episodes=2",
            "logging.interval=50",
            "memory.size=500",
            "imitation.trajectories=3",
        ]
    )
    assert np.isfinite(train(cfg, str(tmp_path)))
