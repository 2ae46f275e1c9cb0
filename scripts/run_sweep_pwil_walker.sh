#!/bin/bash
# Round-5 sweep on a REGRESSED-overlay cell (VERDICT r4 #5, round-3 #9):
# PWIL walker2d @10. The reference's published tuned overlay (optimised on
# real D4RL data) collapses this cell on our generated demos (tuned 0.044
# end vs untuned 1.052 — RESULTS.md); this runs the reference's own
# per-(algorithm, trajectories) tuning WORKFLOW
# (/root/reference/conf/train_all_config.yaml:12-19) end-to-end on OUR
# data: 6 trials (3 Sobol + GP-EI; round-5 wall-clock budget) over the in-repo PWIL search space
# (iltpu/config/conf/search_space.yaml), 300k-step objective, walker2d
# only. A default-config baseline "trial" runs first under the IDENTICAL
# harness so "candidate vs default" is a same-protocol read. The winner is
# then validated at the full 1M protocol (queued separately).
set -u
cd "$(dirname "$0")/.."
LOG=logs/sweep_pwil_walker_r5.log
ARGS="algorithm=PWIL env_backend=auto steps=300000 num_envs=256 evaluation.interval=30000 evaluation.episodes=30 logging.interval=0 imitation.trajectories=10"
if [ -d outputs/all_PWIL ] && [ ! -d outputs/all_PWIL_prev ]; then
  mv outputs/all_PWIL outputs/all_PWIL_prev
fi
echo "=== baseline (default config, same harness) $(date +%H:%M:%S)" >> "$LOG"
timeout 2400 python train_all.py $ARGS seed=12345 --serial --envs walker2d >> "$LOG" 2>&1
echo "--- rc=$? baseline" >> "$LOG"
echo "=== sweep 6 trials $(date +%H:%M:%S)" >> "$LOG"
timeout "${SWEEP_TIMEOUT:-3600}" python train_all.py $ARGS --sweep 6 --early-stop 6 --sobol 3 --serial --envs walker2d >> "$LOG" 2>&1
echo "--- rc=$? sweep $(date +%H:%M:%S)" >> "$LOG"
cp outputs/all_PWIL/sweep.jsonl logs/sweep_pwil_walker_r5.jsonl 2>/dev/null || true
