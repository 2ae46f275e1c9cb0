#!/bin/bash
# Regenerate every results figure from RESULTS.jsonl (CPU-only; safe to
# run while the chip is busy).
set -eu
cd "$(dirname "$0")/.."
# Primary: pre-registered fixed-config figures (protocol-comparable to
# the reference's fixed published-HP protocol).
python scripts/plot_results_matrix.py --out figures/results_matrix.png
python scripts/plot_results_matrix.py --traj-grid --out figures/sample_efficiency_traj.png
# Secondary: per-cell best-scoring variant, annotated.
python scripts/plot_results_matrix.py --best-variant --out figures/results_matrix_best_variant.png
python scripts/plot_results_matrix.py --traj-grid --best-variant --out figures/sample_efficiency_traj_best_variant.png
# Multi-seed IQM+CI (per-env bands) for the algorithms with seed coverage.
python scripts/print_plot_seed_sweep_results.py --from-results RESULTS.jsonl \
  --algorithms GAIL --envs hopper --tuned yes --reps 20000 \
  --out figures/seed_sweep_gail_hopper.png
python scripts/print_plot_seed_sweep_results.py --from-results RESULTS.jsonl \
  --algorithms PWIL --envs hopper --tuned no --reps 20000 \
  --out figures/seed_sweep_pwil_hopper.png
# 4-env GAIL aggregate (ceiling-lifted on ant/walker2d by the >1.0-scoring
# generated demos) and the honest demos-at-parity 2-env companion.
python scripts/print_plot_seed_sweep_results.py --from-results RESULTS.jsonl \
  --algorithms GAIL --envs hopper walker2d halfcheetah ant --tuned yes \
  --reps 20000 --out figures/seed_sweep_gail_4env.png || true
python scripts/print_plot_seed_sweep_results.py --from-results RESULTS.jsonl \
  --algorithms GAIL --envs hopper halfcheetah --tuned yes --reps 20000 \
  --out figures/seed_sweep_gail_parity2env.png || true
# Round-5 flagship: real multi-seed GAIL hopper v2 + min_alpha floor.
python scripts/print_plot_seed_sweep_results.py --from-results RESULTS.jsonl \
  --algorithms GAIL --envs hopper --tuned yes --dataset _v2 \
  --extra reinforcement.min_alpha=0.05 --reps 20000 \
  --out figures/seed_sweep_gail_hopper_minalpha.png || true
echo "figures refreshed"
