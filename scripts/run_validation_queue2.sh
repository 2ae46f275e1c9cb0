#!/bin/bash
# Phase-5 validation queue: runs after run_validation_queue.sh finishes
# (waits on its completion marker in the log). Tests the data-freshness
# hypothesis for the unstable relabelling algorithms — the reference
# interleaves 1 fresh transition per update, while num_envs=256 batches
# 256 fresh transitions then 256 updates; num_envs=64 is 4x closer to the
# reference's schedule — and adds seed diversity on the weakest cells.
set -u
cd "$(dirname "$0")/.."
LOG=logs/validation_queue.log
# Bounded wait: if phase 1 dies without its completion marker, start
# anyway after 6h rather than spinning forever.
waited=0
until grep -q "queue done" "$LOG" 2>/dev/null || [ "$waited" -ge 21600 ]; do
  sleep 60
  waited=$((waited + 60))
done
run() {
  echo "=== $(date +%H:%M:%S) validate $*" >> "$LOG"
  timeout 5400 python scripts/validate_learning.py --steps 1000000 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
run --algorithms AdRIL --envs hopper --tuned --seed 2 --num-envs 64
run --algorithms SQIL --envs hopper --seed 2 --num-envs 64
run --algorithms GAIL --envs hopper --tuned --seed 2
run --algorithms AdRIL --envs hopper --seed 3 --num-envs 64
echo "=== queue2 done $(date +%H:%M:%S)" >> "$LOG"
