#!/usr/bin/env python
"""Seed-sweep aggregation: print + plot IQM normalized scores with
stratified-bootstrap CIs (reference C22,
`scripts/print_plot_seed_sweep_results.py:32-69`, reimplemented on the
in-repo rliable-equivalent in `iltpu.analysis`).

Usage:
  python scripts/print_plot_seed_sweep_results.py \
      --root outputs --algorithms GAIL PWIL --envs ant halfcheetah hopper walker2d \
      [--reps 50000] [--out figures/sample_efficiency.png]

For every algorithm it builds the (seeds, envs, evals) normalized-score
tensor from `<root>/<ALG>_<env>/*/metrics.pkl`, prints the final-eval IQM
± 95% CI, and draws the sample-efficiency figure (IQM curve + CI band per
algorithm, one panel per env plus an all-env aggregate).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iltpu.analysis import collect_seed_sweep, iqm, stratified_bootstrap_ci

ENVS = ["ant", "halfcheetah", "hopper", "walker2d"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="outputs")
    p.add_argument("--algorithms", nargs="+", required=True)
    p.add_argument("--envs", nargs="+", default=ENVS)
    p.add_argument("--reps", type=int, default=50_000)
    p.add_argument("--ci", type=float, default=0.95)
    p.add_argument("--out", default="sample_efficiency.png")
    p.add_argument("--json", action="store_true", help="print results as JSON")
    args = p.parse_args(argv)

    results = {}
    curves = {}
    for alg in args.algorithms:
        steps, tensor, _ = collect_seed_sweep(args.root, alg, args.envs)
        n_runs, n_envs, n_evals = tensor.shape
        # Final-eval aggregate over (seeds, envs) — the headline number.
        point, lo, hi = stratified_bootstrap_ci(
            tensor[..., -1], iqm, reps=args.reps, ci=args.ci
        )
        results[alg] = {
            "iqm": point,
            "ci_lo": lo,
            "ci_hi": hi,
            "seeds": n_runs,
            "envs": n_envs,
            "evals": n_evals,
        }
        # Per-eval curves (cheaper bootstrap for the band).
        band_reps = min(args.reps, 2_000)
        curve = np.empty((n_evals, 3))
        for t in range(n_evals):
            curve[t] = stratified_bootstrap_ci(
                tensor[..., t], iqm, reps=band_reps, ci=args.ci
            )
        curves[alg] = (steps, curve, tensor)

    for alg, r in results.items():
        print(
            f"{alg}: IQM normalized score {r['iqm']:.3f} "
            f"[{r['ci_lo']:.3f}, {r['ci_hi']:.3f}] "
            f"({r['seeds']} seeds x {r['envs']} envs)"
        )
    if args.json:
        print(json.dumps(results))

    _plot(args, curves)
    return results


def _plot(args, curves):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_envs = len(args.envs)
    fig, axes = plt.subplots(
        1, n_envs + 1, figsize=(4 * (n_envs + 1), 3.5), squeeze=False
    )
    axes = axes[0]
    for alg, (steps, curve, tensor) in curves.items():
        # Aggregate panel: IQM over (seeds, envs) with CI band.
        axes[-1].plot(steps, curve[:, 0], label=alg)
        axes[-1].fill_between(steps, curve[:, 1], curve[:, 2], alpha=0.2)
        # Per-env panels: IQM over seeds.
        for e in range(n_envs):
            env_curve = iqm(tensor[:, e, :], axis=0)
            axes[e].plot(steps, env_curve, label=alg)
    for e, env in enumerate(args.envs):
        axes[e].set_title(env)
        axes[e].set_xlabel("env steps")
    axes[-1].set_title("aggregate (all envs)")
    axes[0].set_ylabel("IQM normalized score")
    axes[-1].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
