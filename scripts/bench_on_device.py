#!/usr/bin/env python
"""On-device-loop throughput at scale (SURVEY §7 design-stance evidence).

Runs GAIL on the pure-JAX pointmass env with the WHOLE act/step/append/
update cycle inside chunked `lax.scan` programs (`Trainer._device_loop`)
— zero host involvement between metric boundaries — and reports
steady-state env-steps/s at large env batches. This is the path MJX
physics plugs into (`iltpu/envs/jaxenv.py`); the analytic envs prove the
zero-host-boundary loop at scale since MJX itself is absent from this
image.

Two ratios per num_envs:
- 1:1 step:update (the reference protocol, conf/train_config.yaml:17):
  update-latency-bound, comparable to bench.py's headline.
- 1 update per vector step (training.interval=num_envs): the scalable
  vectorised-env regime — what the host boundary would otherwise cap.

Usage: python scripts/bench_on_device.py [--num-envs 1024,4096]
Prints one JSON line per (num_envs, ratio).
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", default="1024,4096")
    p.add_argument("--iters", type=int, default=1024,
                   help="steady scan iterations measured over the last half")
    p.add_argument("--platform", default=None)
    p.add_argument("--algorithm", default="GAIL")
    p.add_argument("--env", default="pointmass")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    results = []
    for n in [int(x) for x in args.num_envs.split(",")]:
        for ratio_name, interval in (("1:1", 1), ("1/vecstep", n)):
            start = 4 * n
            steps = start + args.iters * n
            # Cap per-chunk device-program size: one lax.scan chunk at 1:1
            # executes chunk*n updates in a single XLA program; at n=4096
            # a 256-iteration chunk is a ~95 s device program, which the
            # tunneled worker kills (observed crash). Keep chunk*n around
            # the known-good 2^18 env-steps per program.
            chunk = max(16, min(args.iters // 4, (1 << 18) // n))
            cfg = load_config(
                [
                    f"algorithm={args.algorithm}",
                    f"env={args.env}",
                    "env_backend=jax",
                    "training.on_device_loop=true",
                    "training.sac_pallas=true",
                    "training.disc_pallas=true",
                    f"training.interval={interval}",
                    f"training.start={start}",
                    f"training.timing_skip_steps={start + (args.iters // 2) * n}",
                    "prng=rbg",
                    "seed=1",
                    f"num_envs={n}",
                    f"steps={steps}",
                    f"evaluation.interval={steps + 1}",
                    "evaluation.episodes=1",
                    f"logging.interval={chunk * n}",
                    "memory.size=1000000",
                    "imitation.trajectories=5",
                    "check_time_usage=true",
                    "expert_data.source=synthetic",
                ]
            )
            trainer = Trainer(
                cfg, out_dir="/tmp/iltpu_bench_dev",
                file_prefix=f"n{n}_{interval}_",
            )
            trainer.run()
            v = (
                trainer.metrics["steady_env_steps"]
                / trainer.metrics["steady_time"]
            )
            row = {
                "metric": f"on-device {args.algorithm}-{args.env}"
                f" env-steps/s ({ratio_name} step:update)",
                "num_envs": n,
                "value": round(v, 1),
                "unit": "env-steps/s",
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
