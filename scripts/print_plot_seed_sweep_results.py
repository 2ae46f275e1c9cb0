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
    p.add_argument(
        "--from-results",
        default=None,
        metavar="RESULTS.jsonl",
        help="select run dirs from RESULTS.jsonl rows matching one"
        " configuration (prevents mixing tuned/untuned/trajectory-count"
        " variants that share an output directory)",
    )
    p.add_argument("--trajectories", type=int, default=10)
    p.add_argument(
        "--tuned", default=None, choices=["yes", "no", "best"],
        help="with --from-results: tuned rows, untuned rows, or per-(alg,"
        " env) whichever variant has seed-1 data (best = prefer the"
        " configuration RESULTS.md headlines)",
    )
    p.add_argument("--num-envs-filter", type=int, default=256)
    p.add_argument(
        "--dataset", default=None,
        help="with --from-results: restrict to rows on this dataset."
        " A leading underscore is a per-env SUFFIX (e.g. '_v2' matches"
        " <env>_expert_v2 for every pooled env — use this for multi-env"
        " pooling); otherwise the full dataset name (e.g."
        " hopper_expert_v2, single-env pooling only). Default: the base"
        " generated dataset (empty field). Rows with --extra overrides"
        " are excluded unless --extra names the variant.",
    )
    p.add_argument(
        "--extra", default="",
        help="with --from-results: select rows whose extra-override string"
        " EQUALS this (e.g. 'reinforcement.min_alpha=0.05' aggregates the"
        " floored 10-seed column). Default '': base-config rows only —"
        " mixing variants into one CI would not be a seed sweep.",
    )
    args = p.parse_args(argv)

    def _rows_for(alg):
        """RESULTS.jsonl rows for this algorithm at the filtered config,
        grouped {env: [rows sorted by seed]}."""
        with open(args.from_results) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        rows = [
            r
            for r in rows
            if r["algorithm"] == alg
            and r["trajectories"] == args.trajectories
            and int(r.get("num_envs", 256)) == args.num_envs_filter
            and (r.get("extra") or "") == args.extra
        ]
        by_env = {}
        for env in args.envs:
            er = [r for r in rows if r["env"] == env]
            if args.dataset is None:
                er = [r for r in er if not r.get("dataset")]
            elif args.dataset.startswith("_"):
                # per-env suffix: '_v2' selects <env>_expert_v2 in each panel
                er = [
                    r for r in er
                    if (r.get("dataset") or "") == f"{env}_expert{args.dataset}"
                ]
            else:
                er = [r for r in er if (r.get("dataset") or "") == args.dataset]
            if args.tuned in ("yes", "no"):
                er = [r for r in er if bool(r.get("tuned")) == (args.tuned == "yes")]
            elif args.tuned == "best":
                # pick the variant with more seeds; tie-break on best score
                tuned_r = [r for r in er if r.get("tuned")]
                untuned_r = [r for r in er if not r.get("tuned")]
                er = max(
                    (tuned_r, untuned_r),
                    key=lambda rs: (
                        len(rs),
                        max((r["best_normalized_score"] for r in rs), default=-1),
                    ),
                )
            er.sort(key=lambda r: r["seed"])
            by_env[env] = er
        return by_env

    def _row_steps(r):
        iv = int(r.get("eval_interval") or max(r["steps"] // 10, 1))
        return [(i + 1) * iv for i in range(len(r["eval_curve"]))]

    def _tensor_from_rows(alg):
        """(steps, tensor(runs, envs, evals)) from RESULTS.jsonl eval
        curves. Each row is one seed's per-eval mean normalized score (the
        per-seed statistic; artifact-wipe-proof — metrics.pkl from earlier
        rounds may be gone). Curves on different eval cadences are aligned
        on the intersection of their step grids."""
        by_env = _rows_for(alg)
        grids = [
            set(_row_steps(r)) for env in args.envs for r in by_env[env]
        ]
        if not grids or not all(by_env[env] for env in args.envs):
            missing = [env for env in args.envs if not by_env[env]]
            raise FileNotFoundError(
                f"{alg}: no RESULTS rows for envs {missing} at"
                f" trajectories={args.trajectories}, tuned={args.tuned},"
                f" num_envs={args.num_envs_filter}"
            )
        common = sorted(set.intersection(*grids))
        assert common, f"{alg}: eval-step grids share no common points"
        per_env = []
        for env in args.envs:
            rows_e = by_env[env]
            curves_e = []
            for r in rows_e:
                lookup = dict(zip(_row_steps(r), r["eval_curve"]))
                curves_e.append([lookup[s] for s in common])
            per_env.append(np.asarray(curves_e))
        n_runs = min(c.shape[0] for c in per_env)
        tensor = np.stack([c[:n_runs] for c in per_env], axis=1)
        return np.asarray(common), tensor

    results = {}
    curves = {}
    for alg in args.algorithms:
        if args.from_results:
            steps, tensor = _tensor_from_rows(alg)
        else:
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
        # Per-env final-eval breakdown (the reference prints per-env IQMs,
        # scripts/print_plot_seed_sweep_results.py:61).
        _, _, tensor = curves[alg]
        for e, env in enumerate(args.envs):
            pt, lo, hi = stratified_bootstrap_ci(
                tensor[:, e : e + 1, -1], iqm, reps=args.reps, ci=args.ci
            )
            print(f"  {env}: final IQM {pt:.3f} [{lo:.3f}, {hi:.3f}]")
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
        # Per-env panels: IQM over seeds + bootstrap CI band.
        from iltpu.analysis import stratified_bootstrap_ci as _ci

        for e in range(n_envs):
            env_curve = iqm(tensor[:, e, :], axis=0)
            band = np.array([
                _ci(tensor[:, e : e + 1, t], iqm, reps=1000)
                for t in range(tensor.shape[-1])
            ])
            axes[e].plot(steps, env_curve, label=alg)
            axes[e].fill_between(steps, band[:, 1], band[:, 2], alpha=0.2)
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
