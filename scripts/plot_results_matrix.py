#!/usr/bin/env python
"""Render the validation results matrix (RESULTS.jsonl) as the reference's
sample-efficiency figure: one panel per environment, normalized-score
learning curves per algorithm (reference README.md:124 equivalent,
produced from this framework's real TPU validation runs).

Variant selection is PRE-REGISTERED (protocol-comparable to the
reference, which holds one published configuration fixed per algorithm,
scripts/print_plot_seed_sweep_results.py:32-41): `CONFIG_POLICY` below
pins tuned/untuned per algorithm and `_dataset_rank` pins the canonical
data variant per env, both fixed across every cell BEFORE looking at
scores. `--best-variant` keeps the old per-cell best-scoring selection
as a secondary view, annotating each cell with the variant it picked and
its seed count. Multiple seeds are averaged pointwise over the common
eval grid.

Usage: python scripts/plot_results_matrix.py [--out figures/results_matrix.png]
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fixed categorical assignment (validated 8-hue order; color follows the
# algorithm identity across panels, never the panel-local rank). SQIL is
# AdRIL with update_freq=0, so it wears AdRIL's hue with a dashed line.
PALETTE = {
    "GAIL": "#2a78d6",
    "PWIL": "#eb6834",
    "AdRIL": "#1baf7a",
    "BC": "#eda100",
    "SAC": "#e87ba4",
    "GMMIL": "#008300",
    "DRIL": "#4a3aa7",
    "RED": "#e34948",
    "SQIL": "#1baf7a",
}
DASHED = {"SQIL"}
ENVS = ["ant", "halfcheetah", "hopper", "walker2d"]
ALG_ORDER = ["GAIL", "PWIL", "AdRIL", "SQIL", "BC", "SAC", "GMMIL", "DRIL", "RED"]


def load_rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


# Pre-registered per-algorithm configuration for the primary figure —
# fixed across every (env, trajectories) cell, decided by documented
# rules rather than per-cell scores:
#   * tuned where the reference publishes an optimised overlay AND our
#     data-distribution study did not document a regression of that
#     overlay on the generated demos (RESULTS.md "tuned overlays
#     regress" rows; the overlays were optimised on real D4RL data) —
#     that leaves GAIL tuned, everything else untuned;
#   * BC/SQIL/SAC have no published overlays (reference
#     conf/optimised_hyperparameters/ covers 6 algorithms).
CONFIG_POLICY = {
    "GAIL": True, "PWIL": False, "AdRIL": False, "SQIL": False,
    "BC": False, "SAC": False, "GMMIL": False, "DRIL": False, "RED": False,
}


def _dataset_rank(env, row):
    """Canonical data variant per env (pre-registered, data-quality based:
    docs/ADRIL_ROOTCAUSE.md): regenerated timeout-ended `_v2` demos when
    they exist, else the documented terminals->timeouts label repair on
    hopper (whose generated demos are 100% terminal-ended), else the
    default dataset. Lower rank = preferred."""
    ds = row.get("dataset") or ""
    fix = bool(row.get("data_fix"))
    if ds.endswith("_expert_v2"):
        return 0
    if env == "hopper" and fix and not ds:
        return 1
    if not ds and not fix:
        return 2
    return 3


def pick_curves(rows, trajectories=10, best_variant=False):
    """(alg, env) -> (curve, steps, n_seeds, variant_label).

    Default: pre-registered fixed configuration (CONFIG_POLICY tuned
    flag + canonical dataset rank + num_envs=256), protocol-comparable
    to the reference's fixed published-HP figure. With best_variant=True:
    the variant (tuned/untuned, data-fix, dataset, num_envs, steps) with
    the highest mean run-avg score wins (disclosed per-cell in the
    annotation)."""
    cells = {}
    for r in rows:
        if r.get("trajectories", 10) != trajectories:
            continue
        key = (r["algorithm"], r["env"])
        cells.setdefault(key, []).append(r)
    out = {}
    for key, rs in cells.items():
        alg, env = key
        variants = {}
        for r in rs:
            vkey = (bool(r.get("tuned")), bool(r.get("data_fix")),
                    r.get("dataset") or "", int(r.get("num_envs", 256)),
                    int(r.get("steps", 0)), r.get("extra") or "")
            variants.setdefault(vkey, []).append(r)
        deviates = best_variant  # best-variant mode always discloses
        if best_variant:
            chosen = max(
                variants.values(),
                key=lambda v: np.mean(
                    [x["final_normalized_score"] for x in v]
                ),
            )
        else:
            want_tuned = CONFIG_POLICY.get(alg, False)
            # mitigation-experiment rows (--extra overrides) are not the
            # canonical configuration; the fixed-config figure excludes them
            pool = [r for r in rs
                    if bool(r.get("tuned")) == want_tuned
                    and int(r.get("num_envs", 256)) == 256
                    and not r.get("extra")]
            if not pool:  # cell only exists in a non-fixed-config variant:
                # admit it but mark the cell so the deviation is DISCLOSED
                # in the figure (annotation rendered whenever this fallback
                # fires, not only under --best-variant).
                deviates = True
                pool = [r for r in rs
                        if int(r.get("num_envs", 256)) == 256
                        and not r.get("extra")] or rs
            best_rank = min(_dataset_rank(env, r) for r in pool)
            chosen = [r for r in pool if _dataset_rank(env, r) == best_rank]
        tuned = [r for r in chosen if r.get("tuned")]
        # Only average runs on the same eval grid (same steps AND same
        # number of evals): mixing grids would misalign step positions.
        chosen = [r for r in chosen if r.get("eval_curve")]
        if not chosen:
            continue
        grid = max(
            {(r["steps"], len(r["eval_curve"])) for r in chosen},
            key=lambda g: sum(
                1
                for r in chosen
                if (r["steps"], len(r["eval_curve"])) == g
            ),
        )
        picked = [
            r for r in chosen
            if (r["steps"], len(r["eval_curve"])) == grid
        ]
        curves = [r["eval_curve"] for r in picked]
        out[key] = (
            np.mean(curves, axis=0),
            grid[0],
            len(curves),
            _variant_label(picked[0], bool(tuned), len(curves))
            if deviates
            else None,
        )
    return out


def _variant_label(row, tuned, n_seeds):
    """Compact per-cell disclosure: which variant + how many seeds."""
    bits = ["tuned" if tuned else "untuned"]
    ds = row.get("dataset") or ""
    if ds.endswith("_expert_v2"):
        bits.append("v2")
    elif row.get("data_fix"):
        bits.append("+fix")
    if int(row.get("num_envs", 256)) != 256:
        bits.append(f"n{row.get('num_envs')}")
    if int(row.get("steps", 0)) not in (0, 1_000_000):
        bits.append(f"{row['steps'] // 1000}k")
    if row.get("extra"):
        bits.append(row["extra"].split("=")[0].split(".")[-1])
    return f"{'/'.join(bits)} s={n_seeds}"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results", default=os.path.join(ROOT, "RESULTS.jsonl"))
    p.add_argument(
        "--out", default=os.path.join(ROOT, "figures", "results_matrix.png")
    )
    p.add_argument("--trajectories", type=int, default=10)
    p.add_argument(
        "--traj-grid", action="store_true",
        help="render the reference's sample_efficiency_traj.png analogue:"
        " one row per env, one column per expert-trajectory count",
    )
    p.add_argument(
        "--best-variant", action="store_true",
        help="secondary view: per-cell best-scoring variant selection"
        " (annotated per cell) instead of the pre-registered fixed config",
    )
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.traj_grid:
        return _traj_grid(args, plt)

    curves = pick_curves(
        load_rows(args.results), args.trajectories,
        best_variant=args.best_variant,
    )
    steps_total = 1_000_000

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), sharex=True, sharey=True)
    ink, muted = "#1a1a19", "#6b6a60"
    for ax, env in zip(axes.flat, ENVS):
        notes = []
        for alg in ALG_ORDER:
            item = curves.get((alg, env))
            if item is None:
                continue
            curve, run_steps, n_seeds, label = item
            if label is not None:  # None = fixed config, nothing to disclose
                notes.append((alg, label))
            if len(curve) == 1:  # BC: one eval after pretraining -> flat line
                curve = np.repeat(curve, 2)
                x = np.array([0, steps_total])
            else:
                x = np.linspace(
                    run_steps / len(curve), run_steps, len(curve)
                )
            ax.plot(
                x,
                curve,
                color=PALETTE[alg],
                lw=2,
                ls="--" if alg in DASHED else "-",
                solid_capstyle="round",
            )
        ax.set_title(env, color=ink, fontsize=11)
        if notes:  # best-variant picks AND fixed-config fallback deviations
            ax.text(
                0.99, 0.02,
                "\n".join(f"{a}: {v}" for a, v in notes),
                transform=ax.transAxes, ha="right", va="bottom",
                fontsize=5.5, color=muted, family="monospace",
            )
        ax.axhline(1.0, color=muted, lw=0.8, ls=":", zorder=0)
        ax.grid(True, color="#e8e6dc", lw=0.6, zorder=0)
        ax.tick_params(colors=muted, labelsize=8)
        for spine in ax.spines.values():
            spine.set_color("#e8e6dc")
        ax.set_xlim(0, steps_total)
    for ax in axes[-1]:
        ax.set_xlabel("environment steps", color=muted, fontsize=9)
    for ax in axes[:, 0]:
        ax.set_ylabel("D4RL-normalized score", color=muted, fontsize=9)

    handles = [
        plt.Line2D(
            [0], [0], color=PALETTE[a], lw=2,
            ls="--" if a in DASHED else "-",
        )
        for a in ALG_ORDER
        if any((a, e) in curves for e in ENVS)
    ]
    labels = [a for a in ALG_ORDER if any((a, e) in curves for e in ENVS)]
    fig.legend(
        handles, labels, loc="lower center", ncol=min(len(labels), 9),
        frameon=False, fontsize=9, labelcolor=ink,
    )
    fig.suptitle(
        "iltpu learning validation — greedy-eval normalized score "
        + ("(best-scoring variant per cell, see annotations)"
           if args.best_variant else
           "(fixed config: GAIL tuned, others untuned; canonical data"
           " variant per env; dotted = expert)"),
        color=ink, fontsize=11,
    )
    fig.tight_layout(rect=(0, 0.06, 1, 0.97))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=150)
    print(args.out)


def _traj_grid(args, plt):
    """Reference figures/sample_efficiency_traj.png analogue: envs (rows)
    x expert-trajectory counts (columns), curves per algorithm."""
    rows = load_rows(args.results)
    traj_counts = [5, 10, 25]
    by_traj = {
        n: pick_curves(rows, n, best_variant=args.best_variant)
        for n in traj_counts
    }
    envs = [
        e for e in ENVS
        if any((a, e) in by_traj[n] for a in ALG_ORDER for n in traj_counts)
    ]
    ink, muted = "#1a1a19", "#6b6a60"
    fig, axes = plt.subplots(
        len(envs), len(traj_counts),
        figsize=(4 * len(traj_counts), 2.8 * len(envs)),
        sharex=True, sharey="row", squeeze=False,
    )
    present = set()
    for i, env in enumerate(envs):
        for j, n in enumerate(traj_counts):
            ax = axes[i][j]
            notes = []
            for alg in ALG_ORDER:
                item = by_traj[n].get((alg, env))
                if item is None:
                    continue
                curve, run_steps, n_seeds, label = item
                if label is not None:
                    notes.append((alg, label))
                present.add(alg)
                if len(curve) == 1:
                    curve = np.repeat(curve, 2)
                    x = np.array([0, 1_000_000])
                else:
                    x = np.linspace(
                        run_steps / len(curve), run_steps, len(curve)
                    )
                ax.plot(x, curve, color=PALETTE[alg], lw=1.8,
                        ls="--" if alg in DASHED else "-")
            if i == 0:
                ax.set_title(f"{n} trajectories", color=ink, fontsize=10)
            if notes:  # disclose any deviation from the fixed config
                ax.text(
                    0.99, 0.02,
                    "\n".join(f"{a}: {v}" for a, v in notes),
                    transform=ax.transAxes, ha="right", va="bottom",
                    fontsize=5, color=muted, family="monospace",
                )
            if j == 0:
                ax.set_ylabel(env, color=ink, fontsize=10)
            ax.axhline(1.0, color=muted, lw=0.8, ls=":", zorder=0)
            ax.grid(True, color="#e8e6dc", lw=0.6, zorder=0)
            ax.tick_params(colors=muted, labelsize=7)
            for spine in ax.spines.values():
                spine.set_color("#e8e6dc")
            ax.set_xlim(0, 1_000_000)
    for ax in axes[-1]:
        ax.set_xlabel("environment steps", color=muted, fontsize=8)
    handles = [
        plt.Line2D([0], [0], color=PALETTE[a], lw=2,
                   ls="--" if a in DASHED else "-")
        for a in ALG_ORDER if a in present
    ]
    labels = [a for a in ALG_ORDER if a in present]
    fig.legend(handles, labels, loc="lower center",
               ncol=min(len(labels), 9), frameon=False, fontsize=9,
               labelcolor=ink)
    fig.suptitle(
        "iltpu sample efficiency by expert-trajectory count "
        + ("(best-scoring variant per cell, see annotations)"
           if args.best_variant else
           "(fixed config: GAIL tuned, others untuned; canonical data"
           " variant per env)"),
        color=ink, fontsize=11,
    )
    fig.tight_layout(rect=(0, 0.05, 1, 0.96))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=150)
    print(args.out)


if __name__ == "__main__":
    main()
