#!/bin/bash
# Phase-6 validation queue (round 2 resume): the phase-5 queue
# (run_validation_queue2.sh) never ran — the round stopped first. This
# queue runs its data-freshness hypothesis cells first (AdRIL/SQIL with
# num_envs=64, 4x closer to the reference's 1-fresh-transition-per-update
# schedule), then fills the remaining cells of the reference's 8-alg
# matrix (BC tuned, DRIL/RED walker2d).
set -u
cd "$(dirname "$0")/.."
LOG=logs/validation_queue.log
run() {
  echo "=== $(date +%H:%M:%S) validate $*" >> "$LOG"
  timeout 5400 python scripts/validate_learning.py --steps 1000000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run --algorithms AdRIL --envs hopper --tuned --seed 2 --num-envs 64
run --algorithms SQIL --envs hopper --seed 2 --num-envs 64
run --algorithms AdRIL --envs walker2d --tuned --seed 2 --num-envs 64
run --algorithms BC --envs ant,halfcheetah,walker2d --tuned
run --algorithms SQIL --envs hopper --seed 3 --num-envs 16
run --algorithms DRIL,RED --envs walker2d --tuned
run --algorithms SQIL,SAC --envs halfcheetah
echo "=== queue3 done $(date +%H:%M:%S)" >> "$LOG"
