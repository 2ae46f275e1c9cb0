#!/usr/bin/env python
"""AdRIL/SQIL root-cause comparison across num_envs (round-2 review #1).

Loads the metrics.pkl of AdRIL (or SQIL) validation runs at different
num_envs (the {1, 64, 256} controls) and prints/plots the diagnostics that
separate a batched-execution artifact from a semantics bug:

- eval learning curve (D4RL-normalized),
- Q-value mean per logged update,
- temperature alpha,
- policy-batch staleness fraction + live trajectory count (AdRIL only,
  recorded by the trainer's diag_* instrumentation).

Usage:
  python scripts/adril_diagnosis.py --rows AdRIL:hopper:10  \
      [--results RESULTS.jsonl] [--out figures/adril_diagnosis.png]
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def load_runs(results_path, algorithm, env, trajectories):
    with open(results_path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    rows = [
        r
        for r in rows
        if r["algorithm"] == algorithm
        and r["env"] == env
        and r["trajectories"] == trajectories
    ]
    runs = []
    for r in rows:
        d = os.path.join(ROOT, r["out_dir"])
        m = None
        p = os.path.join(d, "metrics.pkl")
        if os.path.isfile(p):
            with open(p, "rb") as f:
                m = pickle.load(f)
        runs.append((r, m))
    return runs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", default="AdRIL:hopper:10")
    p.add_argument("--results", default=os.path.join(ROOT, "RESULTS.jsonl"))
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    alg, env, traj = args.rows.split(":")

    runs = load_runs(args.results, alg, env, int(traj))
    if not runs:
        print("no matching rows"); return

    print(f"=== {alg} {env} @{traj} trajectories — by num_envs ===")
    print(f"{'n_env':>6} {'seed':>4} {'tuned':>5} {'run-avg':>8} {'best':>6}"
          f" {'last':>6} {'n_traj@end':>10} {'stale@end':>9} {'alpha@end':>9}"
          f" {'Qmean@end':>9}")
    panels = []
    for r, m in sorted(runs, key=lambda x: (x[0].get("num_envs", 256), x[0]["seed"])):
        n_traj = stale = alpha = q = float("nan")
        if m is not None:
            if m.get("diag_num_trajectories"):
                n_traj = m["diag_num_trajectories"][-1]
            if m.get("diag_adril_stale_frac"):
                stale = m["diag_adril_stale_frac"][-1]
            if m.get("alphas"):
                alpha = float(m["alphas"][-1])
            if m.get("Q_values"):
                q = float(np.mean(m["Q_values"][-1]))
        print(f"{r.get('num_envs', 256):>6} {r['seed']:>4}"
              f" {str(bool(r.get('tuned')))[0]:>5}"
              f" {r['final_normalized_score']:>8.3f}"
              f" {r['best_normalized_score']:>6.3f}"
              f" {r.get('last_normalized_score', float('nan')):>6.3f}"
              f" {n_traj:>10.0f} {stale:>9.3f} {alpha:>9.4f} {q:>9.2f}")
        if m is not None:
            panels.append((r, m))

    if args.out and panels:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 4, figsize=(18, 3.6))
        for r, m in panels:
            label = f"n_env={r.get('num_envs', 256)} s{r['seed']}" + (
                " tuned" if r.get("tuned") else ""
            )
            ts = m["test_steps"]
            curve = [float(np.mean(x)) for x in m["test_returns_normalized"]]
            axes[0].plot(ts, curve, label=label)
            us = m["update_steps"]
            axes[1].plot(us, [float(np.mean(x)) for x in m["Q_values"]], label=label)
            axes[2].plot(us, m["alphas"], label=label)
            if m.get("diag_adril_stale_frac"):
                axes[3].plot(us, m["diag_adril_stale_frac"], label=label)
        for ax, title in zip(
            axes,
            ["eval normalized score", "mean Q", "alpha", "policy-batch stale frac"],
        ):
            ax.set_title(title)
            ax.set_xlabel("env steps")
        axes[2].set_yscale("log")
        axes[0].legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
