#!/bin/bash
# Phase-7 validation queue (for the next round): the reference's figure
# sweeps expert-trajectory counts {5,10,25} — all current RESULTS cells
# are traj=10, so add the traj dimension on the strongest methods, plus
# the cells phase-6 didn't reach. Start this on a FREE chip.
set -u
cd "$(dirname "$0")/.."
LOG=logs/validation_queue.log
run() {
  echo "=== $(date +%H:%M:%S) validate $*" >> "$LOG"
  timeout 5400 python scripts/validate_learning.py --steps 1000000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run --algorithms GAIL --envs hopper --tuned --trajectories 25
run --algorithms GAIL --envs hopper --tuned --trajectories 5
run --algorithms PWIL --envs hopper --tuned --trajectories 25
run --algorithms AdRIL --envs walker2d --tuned --seed 2 --num-envs 64
run --algorithms DRIL,RED --envs walker2d --tuned
run --algorithms SQIL,SAC --envs halfcheetah
run --algorithms SQIL,SAC --envs ant
run --algorithms DRIL,RED --envs halfcheetah --tuned
run --algorithms DRIL,RED --envs ant --tuned
echo "=== queue4 done $(date +%H:%M:%S)" >> "$LOG"
