#!/usr/bin/env python
"""Data-parallel scaling-efficiency benchmark (SURVEY.md §7 step 6).

Measures jitted GAIL+SAC update throughput on a `jax.sharding.Mesh` of
1..N devices with a FIXED per-device batch (weak scaling): efficiency =
throughput(N) / (N * throughput(1)). On real hardware N spans the slice's
chips and the all-reduce rides ICI; here it also runs on the virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) so the sharding
and collective paths are exercised without a pod.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py [--per-device-batch 256] [--iters 50]

Prints one JSON line per mesh size plus a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--algorithm", default="GAIL")
    args = p.parse_args(argv)

    import jax

    # The axon TPU plugin programmatically overrides JAX_PLATFORMS; re-pin
    # from the environment so the virtual CPU mesh actually materialises.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import numpy as np

    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    results = []
    for n_dev in sizes:
        batch = args.per_device_batch * n_dev
        cfg = load_config(
            [
                f"algorithm={args.algorithm}",
                "env=pointmass",
                "env_backend=jax",
                "steps=64",
                "training.start=1",
                f"training.batch_size={batch}",
                "memory.size=4096",
                "imitation.trajectories=3",
                "evaluation.episodes=1",
                "logging.interval=0",
            ]
            + (
                ["parallel.data_axis=data", f"parallel.num_devices={n_dev}"]
                if n_dev > 1
                else []
            )
        )
        trainer = Trainer(cfg, out_dir="/tmp/iltpu_scaling")
        # Fill the replay with random transitions so sampling is valid.
        from iltpu.data import replay_append_batch

        S, A = trainer.state_size, trainer.action_size
        rng = np.random.default_rng(0)
        n = max(batch, 512)
        trainer.state["replay"] = replay_append_batch(
            trainer.state["replay"],
            jnp.arange(n, dtype=jnp.float32),
            jnp.asarray(rng.normal(size=(n, S)), jnp.float32),
            jnp.asarray(np.tanh(rng.normal(size=(n, A))), jnp.float32),
            jnp.zeros(n),
            jnp.asarray(rng.normal(size=(n, S)), jnp.float32),
            jnp.zeros(n),
            jnp.zeros(n),
        )
        key = jax.random.key(0)
        state = trainer.state
        upd = trainer._update
        # warmup/compile
        state, _ = upd(state, key, jnp.float32(1.0))
        jax.block_until_ready(jax.tree.leaves(state)[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, _ = upd(state, jax.random.fold_in(key, i), jnp.float32(i))
        jax.block_until_ready(jax.tree.leaves(state)[0])
        dt = time.perf_counter() - t0
        ups = args.iters / dt
        results.append(
            {
                "devices": n_dev,
                "batch": batch,
                "updates_per_s": round(ups, 2),
                "samples_per_s": round(ups * batch, 1),
            }
        )
        print(json.dumps(results[-1]))

    if len(results) > 1:
        base = results[0]["samples_per_s"]
        eff = {
            r["devices"]: round(r["samples_per_s"] / (base * r["devices"]), 3)
            for r in results[1:]
        }
        summary = {"weak_scaling_efficiency": eff}
        n_cores = os.cpu_count() or 1
        if jax.devices()[0].platform == "cpu" and len(jax.devices()) > n_cores:
            # N virtual devices timeshare n_cores real cores, so wall-clock
            # "efficiency" is bounded by n_cores/N regardless of collective
            # cost — this run validates the sharding/psum paths, not speed.
            summary["note"] = (
                f"virtual CPU mesh ({len(jax.devices())} devices on "
                f"{n_cores} cores): efficiency is core-oversubscription-"
                "bound; meaningful scaling numbers require real chips"
            )
        print(json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
