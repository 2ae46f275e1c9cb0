#!/usr/bin/env python
"""CLI entry point: `python train.py algorithm=GAIL env=hopper [key=value ...]`.

Mirrors the reference's Hydra CLI (train.py:21-23, README.md:66-98): dotted
key=value overrides compose onto the base + per-algorithm config, the run
writes into a timestamped `outputs/<ALG>_<ENV>/<m-d_H-M-S>/` directory, and
the resolved config is saved alongside the results. `--tuned` layers the
published optimised hyperparameters for (algorithm, trajectories).
"""

import datetime
import json
import os
import sys

import yaml


def main(argv=None):
    from iltpu.config import load_config

    args = list(sys.argv[1:] if argv is None else argv)
    use_tuned = "--tuned" in args
    args = [a for a in args if a != "--tuned"]
    cfg = load_config(args, use_tuned=use_tuned)

    # Select the JAX backend BEFORE any device use: plugins (e.g. the axon
    # TPU tunnel) override JAX_PLATFORMS programmatically, so an env var is
    # not enough to pin the platform.
    import jax

    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    # Persistent compile cache (tunneled-TPU compiles can take minutes).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iltpu.trainer import train

    stamp = datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
    out_dir = os.path.join(cfg["output_dir"], f"{cfg['algorithm']}_{cfg['env']}", stamp)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=False)

    score = train(cfg, out_dir)
    summary = {"algorithm": cfg["algorithm"], "env": cfg["env"],
               "mean_normalized_score": score, "out_dir": out_dir}
    print(json.dumps(summary))
    return score


if __name__ == "__main__":
    main()
