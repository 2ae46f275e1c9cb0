#!/usr/bin/env python
"""Forensics for the hopper late-training decay (docs/DECAY_ROOTCAUSE.md).

Reads saved run metrics (metrics.pkl) and prints, per run:
- train-return (stochastic acting policy) mean/p90 by training phase —
  separates "the policy degrades" from "the greedy head is brittle";
- last-N evals' per-eval mean/std/min/max over the 30 greedy episodes —
  within-eval vs between-eval spread;
- alpha / entropy / Q trajectories (first/mid/last).

Usage: python scripts/decay_diagnosis.py outputs/validation/GAIL_hopper/*/metrics.pkl
"""

import pickle
import sys

import numpy as np


def analyze(path, last_evals=10):
    with open(path, "rb") as f:
        m = pickle.load(f)
    print(f"== {path}")
    tr_steps = np.asarray(m["train_steps"])
    tr_ret = np.asarray([x[0] for x in m["train_returns"]])
    hi = tr_steps.max() if len(tr_steps) else 0
    for lo_f, hi_f, name in [(0.4, 0.6, "mid"), (0.8, 1.0, "late")]:
        sel = (tr_steps >= lo_f * hi) & (tr_steps < hi_f * hi + 1)
        if sel.any():
            print(
                f"  train returns {name}: mean={tr_ret[sel].mean():.0f}"
                f" p90={np.percentile(tr_ret[sel], 90):.0f} n={int(sel.sum())}"
            )
    tn = m.get("test_returns_normalized", [])
    if tn:
        print(f"  last {last_evals} evals (mean, std, min, max):")
        for e in tn[-last_evals:]:
            e = np.asarray(e)
            print(
                f"    {e.mean():.2f} ± {e.std():.2f}"
                f"  [{e.min():.2f}, {e.max():.2f}]"
            )
    for key, red in (("alphas", float), ("entropies", np.mean),
                     ("Q_values", np.mean)):
        v = m.get(key, [])
        if v:
            s = [float(red(x)) for x in v]
            print(
                f"  {key}: first={s[0]:.4g} mid={s[len(s) // 2]:.4g}"
                f" last={s[-1]:.4g}"
            )
    diag = {k: v for k, v in m.items() if k.startswith("diag_")}
    for k, v in diag.items():
        print(f"  {k}: first={v[0]:.4g} last={v[-1]:.4g} n={len(v)}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
