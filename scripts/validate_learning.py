#!/usr/bin/env python
"""Learning-curve validation: train (algorithm, env) cells on the in-repo
expert demonstration data and record final D4RL-normalized scores.

The reference's correctness bar is statistical — its learning curves
(README.md:122-124, BASELINE.md) — so this harness produces the equivalent
evidence for this framework: real training runs against the generated
expert datasets (`data/<env>_expert.npz`, scripts/generate_expert_data.py),
final + best eval scores per cell, written to RESULTS.jsonl and rendered
into RESULTS.md.

Resumable: cells already present in RESULTS.jsonl are skipped, so the
matrix can be grown across invocations (one accelerator — runs serialise).

Usage:
  python scripts/validate_learning.py --algorithms GAIL,BC --envs hopper \
      --steps 500000 --trajectories 10 [--tuned]
"""

import argparse
import datetime
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RESULTS_JSONL = os.path.join(ROOT, "RESULTS.jsonl")
RESULTS_MD = os.path.join(ROOT, "RESULTS.md")


def load_results():
    """Rows deduped by cell key, LAST occurrence wins — the file is
    append-only (concurrent runs each append one line; a whole-file
    rewrite under concurrency clobbered rows once)."""
    rows = {}
    if os.path.isfile(RESULTS_JSONL):
        with open(RESULTS_JSONL) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    rows[cell_key(r)] = r
    return list(rows.values())


def cell_key(row):
    return (row["algorithm"], row["env"], row["trajectories"], row["seed"],
            bool(row.get("tuned", False)), int(row.get("num_envs", 256)),
            bool(row.get("data_fix", False)), int(row.get("steps", 0)),
            row.get("dataset") or "", row.get("extra") or "")


def render_md(rows):
    lines = [
        "# RESULTS — learning validation (this framework, real TPU runs)",
        "",
        "Final and best greedy-eval D4RL-normalized scores per (algorithm, env)",
        "cell, trained on the in-repo expert demonstrations",
        "(`data/<env>_expert.npz`; see data/README.md). The reference's",
        "published bar is its sample-efficiency curves (BASELINE.md); these",
        "runs are the parity evidence for this framework. Produced by",
        "`scripts/validate_learning.py`; raw rows in RESULTS.jsonl.",
        "",
        "| algorithm | env | traj | seed | tuned | n_env | data | steps |"
        " run-avg score | end-of-training | best | out_dir |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=cell_key):
        data = r.get("dataset") or ""
        if r.get("data_fix"):
            data = (data + " +fix").strip()
        if r.get("extra"):
            data = (data + " " + r["extra"]).strip()
        lines.append(
            "| {algorithm} | {env} | {trajectories} | {seed} | {tuned} |"
            " {n_env} | {data} | {steps} |"
            " {final:.3f} | {last:.3f} | {best:.3f} | {out_dir} |".format(
                **{
                    **r,
                    "tuned": "yes" if r.get("tuned") else "no",
                    "n_env": r.get("num_envs", 256),
                    "data": data or "default",
                    "final": r["final_normalized_score"],
                    "last": r.get("last_normalized_score",
                                  r["final_normalized_score"]),
                    "best": r["best_normalized_score"],
                }
            )
        )
    lines.append("")
    lines.append(
        "run-avg = mean normalized score over every eval in the run (the"
        " reference's `train()` return / Ax objective, train.py:243);"
        " end-of-training = the last eval point (what the reference's"
        " figure shows at 1M steps). data `+fix` ="
        " expert_data.terminals_to_timeouts (label repair for"
        " terminal-ended generated demos; docs/ADRIL_ROOTCAUSE.md);"
        " `*_expert_v2` = surviving demos harvested from agent_best"
        " snapshots with stochastic reject sampling (all timeout-ended,"
        " normalized >=0.95 — distribution-matches D4RL expert-v2;"
        " data/README.md); extra `key=value` entries = --extra config"
        " overrides (e.g. the reinforcement.min_alpha temperature-floor"
        " mitigation, docs/DECAY_ROOTCAUSE.md)."
    )
    lines.append("")
    with open(RESULTS_MD, "w") as f:
        f.write("\n".join(lines))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algorithms", default="GAIL")
    p.add_argument("--envs", default="hopper")
    p.add_argument("--steps", type=int, default=500_000)
    p.add_argument("--trajectories", type=int, default=10)
    p.add_argument("--seed", type=int, default=1)
    # Reference eval protocol: 30 greedy episodes every 10k env steps
    # (/root/reference/conf/train_config.yaml:21-23) so run-avg scores are
    # comparable to the reference train() return / Ax objective.
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--eval-episodes", type=int, default=30)
    p.add_argument("--eval-interval", type=int, default=10000)
    p.add_argument("--tuned", action="store_true")
    p.add_argument(
        "--data-fix", action="store_true",
        help="expert_data.terminals_to_timeouts=true (distribution-match"
        " D4RL's timeout-ended expert demos; see conf/train.yaml)",
    )
    p.add_argument(
        "--dataset-suffix", default="",
        help="use data/<env>_expert<suffix>.npz (e.g. _v2 for demos"
        " regenerated from the 3e6-step SAC with --only-timeout-episodes);"
        " recorded in the cell key",
    )
    p.add_argument(
        "--extra", default="",
        help="comma-separated extra config overrides (e.g."
        " reinforcement.min_alpha=0.06); part of the cell key and recorded"
        " in the row, so variant runs coexist with the base cell",
    )
    p.add_argument("--rerun", action="store_true", help="redo existing cells")
    p.add_argument("--platform", default=None, help="pin jax backend (tpu|cpu)")
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

    rows = load_results()
    done = {cell_key(r) for r in rows}
    eval_interval = args.eval_interval or max(args.steps // 10, 1)

    for alg in args.algorithms.split(","):
        for env in args.envs.split(","):
            key = (alg, env, args.trajectories, args.seed, bool(args.tuned),
                   args.num_envs, bool(args.data_fix), args.steps,
                   args.dataset_suffix and f"{env}_expert{args.dataset_suffix}",
                   args.extra)
            if key in done and not args.rerun:
                print(f"skip {key} (already in RESULTS.jsonl)")
                continue
            data_path = os.path.join(
                ROOT, "data", f"{env}_expert{args.dataset_suffix}.npz"
            )
            if not os.path.isfile(data_path):
                print(f"skip {key}: no expert data at {data_path}")
                continue
            overrides = [
                f"algorithm={alg}",
                f"env={env}",
                f"seed={args.seed}",
                f"steps={args.steps}",
                f"num_envs={args.num_envs}",
                f"imitation.trajectories={args.trajectories}",
                f"expert_data.source={data_path}",
                f"evaluation.interval={eval_interval}",
                f"evaluation.episodes={args.eval_episodes}",
                "logging.interval=10000",
            ]
            if args.data_fix:
                overrides.append("expert_data.terminals_to_timeouts=true")
            if args.extra:
                overrides.extend(args.extra.split(","))
            cfg = load_config(overrides, use_tuned=args.tuned)
            stamp = datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
            out_dir = os.path.join(
                ROOT, "outputs", "validation", f"{alg}_{env}", stamp
            )
            os.makedirs(out_dir, exist_ok=True)
            print(f"=== {alg} / {env} -> {out_dir}")
            trainer = Trainer(cfg, out_dir)
            final = float(trainer.run())
            norm_scores = [
                float(sum(s) / len(s))
                for s in trainer.metrics.get("test_returns_normalized", [])
                if len(s)
            ]
            row = {
                "algorithm": alg,
                "env": env,
                "trajectories": args.trajectories,
                "seed": args.seed,
                "steps": args.steps,
                "tuned": bool(args.tuned),
                "num_envs": args.num_envs,
                "eval_interval": eval_interval,
                "eval_episodes": args.eval_episodes,
                "data_fix": bool(args.data_fix),
                "dataset": (
                    f"{env}_expert{args.dataset_suffix}"
                    if args.dataset_suffix else ""
                ),
                "extra": args.extra,
                "final_normalized_score": final,
                "last_normalized_score": norm_scores[-1] if norm_scores else final,
                "best_normalized_score": max(norm_scores) if norm_scores else final,
                "eval_curve": norm_scores,
                "out_dir": os.path.relpath(out_dir, ROOT),
                "when": stamp,
            }
            rows = [r for r in rows if cell_key(r) != key] + [row]
            with open(RESULTS_JSONL, "a") as f:
                f.write(json.dumps(row) + "\n")
            render_md(rows)
            print(json.dumps({k: row[k] for k in (
                "algorithm", "env", "final_normalized_score",
                "best_normalized_score")}))

    render_md(rows)


if __name__ == "__main__":
    main()
