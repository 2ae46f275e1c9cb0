#!/usr/bin/env python
"""CLI entry point: `python train.py algorithm=GAIL env=hopper [key=value ...]`.

Mirrors the reference's Hydra CLI (train.py:21-23, README.md:66-98): dotted
key=value overrides compose onto the base + per-algorithm config, the run
writes into a timestamped `outputs/<ALG>_<ENV>/<m-d_H-M-S>/` directory, and
the resolved config is saved alongside the results. `--tuned` layers the
published optimised hyperparameters for (algorithm, trajectories).

`-m`/`--multirun` sweeps the Cartesian product of comma-separated override
values (Hydra multirun semantics, README.md:89-98 — e.g. the reference's
10-seed sweeps `python train.py -m seed=1,2,3 algorithm=GAIL`), running
jobs sequentially (one accelerator) under
`outputs/multirun/<m-d_H-M-S>/<job_idx>/`.
"""

import datetime
import itertools
import json
import os
import sys

import yaml


def expand_multirun(args):
    """Expand Hydra-style sweep overrides into per-job override lists.

    Each `key=a,b,c` (comma outside brackets) becomes a sweep axis; the
    result is the Cartesian product in CLI order (Hydra's job ordering).
    """
    axes = []
    for arg in args:
        key, sep, raw = arg.partition("=")
        if sep and "," in raw and not raw.lstrip().startswith(("[", "{")):
            axes.append([f"{key}={v}" for v in raw.split(",")])
        else:
            axes.append([arg])
    return [list(combo) for combo in itertools.product(*axes)]


def _setup_jax(platform):
    # Select the JAX backend BEFORE any device use: plugins (e.g. the axon
    # TPU tunnel) override JAX_PLATFORMS programmatically, so an env var is
    # not enough to pin the platform.
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    # Persistent compile cache (tunneled-TPU compiles can take minutes).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_one(args, use_tuned, out_dir=None):
    from iltpu.config import load_config
    from iltpu.trainer import train

    cfg = load_config(args, use_tuned=use_tuned)
    _setup_jax(cfg.get("platform"))

    if out_dir is None:
        stamp = datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
        out_dir = os.path.join(
            cfg["output_dir"], f"{cfg['algorithm']}_{cfg['env']}", stamp
        )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=False)

    score = train(cfg, out_dir)
    summary = {"algorithm": cfg["algorithm"], "env": cfg["env"],
               "mean_normalized_score": score, "out_dir": out_dir}
    print(json.dumps(summary))
    return score


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    use_tuned = "--tuned" in args
    multirun = "-m" in args or "--multirun" in args
    args = [a for a in args if a not in ("--tuned", "-m", "--multirun")]

    if not multirun:
        return run_one(args, use_tuned)

    from iltpu.config import load_config

    jobs = expand_multirun(args)
    stamp = datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
    root = os.path.join(
        load_config(jobs[0], use_tuned=use_tuned).get("output_dir", "outputs"),
        "multirun",
        stamp,
    )
    scores = []
    for idx, job_args in enumerate(jobs):
        print(f"[multirun {idx + 1}/{len(jobs)}] {' '.join(job_args)}",
              file=sys.stderr)
        scores.append(
            run_one(job_args, use_tuned, out_dir=os.path.join(root, str(idx)))
        )
    with open(os.path.join(root, "multirun.yaml"), "w") as f:
        yaml.safe_dump(
            {"jobs": [" ".join(j) for j in jobs], "scores": scores}, f
        )
    return scores


if __name__ == "__main__":
    main()
