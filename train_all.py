#!/usr/bin/env python
"""Multi-env runner + hyperparameter optimisation (reference C20/C21:
`train_all.py:12-33` + the hydra-ax-sweeper config `train_all_config.yaml`).

One *trial* trains a single algorithm on all four MuJoCo envs with a shared
random seed and returns the MIN over envs of the mean normalized score — the
conservative HP-opt objective (`train_all.py:19,28`). Envs run in a
`multiprocessing` pool with the forkserver start method (the reference's Ax
deadlock workaround, `train_all.py:32`) or sequentially with `--serial`
(required when sharing one TPU chip).

`--sweep N` runs N-trial Bayesian optimisation over the algorithm's search
space (`iltpu/config/conf/search_space.yaml`) using the in-repo Sobol+GP-EI
optimiser (`iltpu.sweep` — Ax is unavailable here), with the reference's
early stop after 5 non-improving trials.

`--envs a,b` restricts the trial objective to a subset (e.g. a cheap
hopper-only sweep: the reference's 4-env x 30-trial workflow costs ~120
full trainings; a single-env objective keeps the GP/EI path exercised at
a fraction of that).

Usage:
  python train_all.py algorithm=GAIL imitation.trajectories=5 [--serial]
  python train_all.py algorithm=GAIL --sweep 30 [--serial] [--envs hopper]
"""

import json
import multiprocessing as mp
import os
import sys

import numpy as np
import yaml

ENVS = ["ant", "halfcheetah", "hopper", "walker2d"]


def _run_one(packed):
    env, overrides, out_dir = packed
    from iltpu.config import load_config
    from iltpu.trainer import train

    cfg = load_config(overrides + [f"env={env}"])
    env_dir = os.path.join(out_dir, env)
    os.makedirs(env_dir, exist_ok=True)
    return train(cfg, env_dir)


def run_trial(overrides, out_dir, serial=False, envs=None):
    """Train the envs with one shared seed; return min-over-envs score."""
    os.makedirs(out_dir, exist_ok=True)
    envs = envs or ENVS
    jobs = [(env, overrides, out_dir) for env in envs]
    if serial:
        scores = [_run_one(j) for j in jobs]
    else:
        ctx = mp.get_context("forkserver")
        with ctx.Pool(len(jobs)) as pool:
            scores = pool.map(_run_one, jobs)
    return float(min(scores)), dict(zip(envs, scores))


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    serial = "--serial" in args
    args = [a for a in args if a != "--serial"]
    sweep_n = 0
    if "--sweep" in args:
        i = args.index("--sweep")
        sweep_n = int(args[i + 1])
        del args[i : i + 2]
    envs = None
    if "--envs" in args:
        i = args.index("--envs")
        envs = args[i + 1].split(",")
        del args[i : i + 2]
    early_stop = 5  # reference: stop after 5 non-improving trials
    if "--early-stop" in args:
        i = args.index("--early-stop")
        early_stop = int(args[i + 1])
        del args[i : i + 2]
    sobol = None
    if "--sobol" in args:
        i = args.index("--sobol")
        sobol = int(args[i + 1])
        del args[i : i + 2]

    alg = next(
        (a.split("=", 1)[1] for a in args if a.startswith("algorithm=")), "SAC"
    )
    out_root = os.path.join("outputs", f"all_{alg}")

    if not sweep_n:
        # Single trial, shared random seed across envs (train_all.py:19).
        seed = int(np.random.default_rng().integers(0, 2**31))
        overrides = [f"seed={seed}"] + args
        score, per_env = run_trial(overrides, out_root, serial, envs)
        print(json.dumps({"min_score": score, "per_env": per_env, "seed": seed}))
        return score

    # ---------------------------------------------------------------- sweep
    from iltpu.sweep import BayesOpt, space_from_config

    space_path = os.path.join(
        os.path.dirname(__file__), "iltpu", "config", "conf", "search_space.yaml"
    )
    with open(space_path) as f:
        spaces = yaml.safe_load(f)
    if alg not in spaces:
        raise SystemExit(f"no search space for algorithm={alg}")
    opt = BayesOpt(
        space=space_from_config(spaces[alg]),
        total_trials=sweep_n,
        minimize=False,
        early_stop_epochs=early_stop,
        **({"sobol_trials": sobol} if sobol is not None else {}),
    )
    seed = int(np.random.default_rng().integers(0, 2**31))
    log_path = os.path.join(out_root, "sweep.jsonl")
    os.makedirs(out_root, exist_ok=True)
    while not opt.should_stop:
        trial = opt.ask()
        trial_overrides = (
            [f"seed={seed + trial.index}"]
            + args
            + [f"{k}={v}" for k, v in trial.params.items()]
        )
        trial_dir = os.path.join(out_root, f"trial_{trial.index:03d}")
        score, per_env = run_trial(trial_overrides, trial_dir, serial, envs)
        opt.tell(trial, score)
        rec = {
            "trial": trial.index,
            "method": trial.method,
            "params": trial.params,
            "min_score": score,
            "per_env": per_env,
        }
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    best = opt.best_trial()
    print(json.dumps({"best_trial": best.index, "params": best.params,
                      "min_score": best.value}))
    return best.value


if __name__ == "__main__":
    main()
