#!/usr/bin/env python
"""HP-opt sweep analysis (reference C23,
`scripts/print_plot_hp_opt_results.py:22-76`): load trial records, print a
table sorted by the min-over-envs objective, and plot per-parameter small
multiples plus a parallel-coordinates view.

The reference parses hydra `.hydra/overrides.yaml` per trial dir and plots
with Plotly; this framework's sweeper (`train_all.py --sweep`) writes a
single `sweep.jsonl` of {trial, params, min_score, per_env} records, and
Plotly is unavailable, so the plots are matplotlib.

Usage:
  python scripts/print_plot_hp_opt_results.py outputs/all_GAIL/sweep.jsonl \
      [--out hp_opt.png] [--top 10]
"""

import argparse
import json
import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_sweep(path: str) -> pd.DataFrame:
    rows = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            row = {"trial": rec["trial"], "min_score": rec["min_score"],
                   "method": rec.get("method", "?")}
            row.update({f"param:{k}": v for k, v in rec["params"].items()})
            row.update({f"env:{k}": v for k, v in rec.get("per_env", {}).items()})
            rows.append(row)
    return pd.DataFrame(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("sweep", help="path to sweep.jsonl")
    p.add_argument("--out", default="hp_opt.png")
    p.add_argument("--top", type=int, default=10)
    args = p.parse_args(argv)

    df = load_sweep(args.sweep)
    ranked = df.sort_values("min_score", ascending=False)
    with pd.option_context("display.width", 200, "display.max_columns", 50):
        print(ranked.head(args.top).to_string(index=False))

    params = [c for c in df.columns if c.startswith("param:")]
    _plot(df, params, args.out)
    return ranked


def _numeric(series: pd.Series) -> np.ndarray:
    """Map a parameter column to plottable floats (categoricals -> codes).

    Robust across pandas versions: string columns are dtype `object` in
    pandas<3 but a dedicated `str` dtype in pandas>=3, so detect by
    convertibility rather than dtype identity."""
    try:
        return series.astype(float).to_numpy()
    except (ValueError, TypeError):
        return pd.Categorical(series.astype(str)).codes.astype(float)


def _plot(df: pd.DataFrame, params, out: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(params)
    if n == 0:
        return
    cols = min(n, 4)
    rows = math.ceil(n / cols)
    fig, axes = plt.subplots(
        rows + 1, cols, figsize=(3.5 * cols, 3 * (rows + 1)), squeeze=False
    )
    # Small multiples: objective vs each parameter.
    for i, param in enumerate(params):
        ax = axes[i // cols][i % cols]
        ax.scatter(_numeric(df[param]), df["min_score"], s=14, alpha=0.7)
        ax.set_xlabel(param.removeprefix("param:"), fontsize=8)
        ax.set_ylabel("min score", fontsize=8)
    for i in range(n, rows * cols):
        axes[i // cols][i % cols].axis("off")

    # Parallel coordinates across all params, colored by objective.
    ax = axes[rows][0]
    for j in range(1, cols):
        axes[rows][j].axis("off")
    norm_cols = []
    for param in params:
        v = _numeric(df[param])
        lo, hi = np.nanmin(v), np.nanmax(v)
        norm_cols.append((v - lo) / (hi - lo) if hi > lo else np.zeros_like(v))
    mat = np.stack(norm_cols, axis=1)  # (trials, params)
    score = df["min_score"].to_numpy()
    s_lo, s_hi = score.min(), score.max()
    cmap = plt.get_cmap("viridis")
    for t in range(mat.shape[0]):
        c = cmap((score[t] - s_lo) / (s_hi - s_lo) if s_hi > s_lo else 0.5)
        ax.plot(range(len(params)), mat[t], color=c, alpha=0.6, lw=1)
    ax.set_xticks(range(len(params)))
    ax.set_xticklabels(
        [p.removeprefix("param:") for p in params], rotation=45, fontsize=7, ha="right"
    )
    ax.set_title("parallel coordinates (color = min score)", fontsize=9)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
