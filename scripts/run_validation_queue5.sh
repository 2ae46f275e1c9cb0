#!/bin/bash
# Round-3 validation queue (reordered after the AdRIL root-cause finding):
# the num_envs {1,64,256} controls all collapse identically, so batching is
# exonerated and the terminal-ended generated hopper demos are the cause
# (expert_data.terminals_to_timeouts fixes the label distribution; the
# DURABLE fix is regenerating demos from a SAC expert that survives to the
# time limit — which needs the 3e6-step SAC baseline below, so it runs
# first).
# Stop cleanly: touch /tmp/stop_queue (in-flight run finishes, queue exits).
set -u
cd "$(dirname "$0")/.."
LOG=logs/validation_queue.log
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 21600 ))}  # default: +6h
run() {
  if [ -f /tmp/stop_queue ]; then echo "=== stop_queue present, exiting" >> "$LOG"; exit 0; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "=== deadline passed, exiting" >> "$LOG"; exit 0; fi
  echo "=== $(date +%H:%M:%S) validate $*" >> "$LOG"
  timeout "${RUN_TIMEOUT:-5400}" python scripts/validate_learning.py --steps "${RUN_STEPS:-1000000}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
# SAC at the reference 3e6 horizon (VERDICT #6) — also the expert-data
# regeneration source for the AdRIL durable fix
RUN_STEPS=3000000 RUN_TIMEOUT=12000 run --algorithms SAC --envs hopper --eval-interval 30000
# Cheap BC trajectory cells first (pretrain-only, ~5 min each)
run --algorithms BC --envs hopper --trajectories 25
run --algorithms BC --envs hopper --trajectories 5
run --algorithms BC --envs walker2d --trajectories 25
run --algorithms BC --envs walker2d --trajectories 5
# Multi-seed on the headline GAIL cell (CI figure input, VERDICT #2)
run --algorithms GAIL --envs hopper --tuned --seed 2
run --algorithms GAIL --envs hopper --tuned --seed 3
# Trajectory dimension (VERDICT #2)
run --algorithms GAIL --envs hopper --tuned --trajectories 25
run --algorithms GAIL --envs hopper --tuned --trajectories 5
run --algorithms PWIL --envs hopper --trajectories 25
run --algorithms PWIL --envs hopper --trajectories 5
run --algorithms PWIL --envs hopper --seed 2
run --algorithms PWIL --envs hopper --seed 3
# walker2d untuned (tuned-overlay regression suspicion, Weak #3)
run --algorithms GMMIL --envs walker2d
# Tuned-overlay regression reruns at seed 2 (VERDICT #4)
run --algorithms GMMIL --envs hopper --tuned --seed 2
run --algorithms DRIL --envs hopper --tuned --seed 2
run --algorithms PWIL --envs hopper --tuned --seed 2
# AdRIL with the data fix: traj dimension + walker
run --algorithms AdRIL --envs hopper --data-fix --trajectories 25
run --algorithms AdRIL --envs hopper --data-fix --trajectories 5
# (walker2d demos are already timeout-ended — the data fix is a no-op
# there, so the untuned cell runs without the flag)
run --algorithms AdRIL --envs walker2d
# walker2d trajectory dimension
run --algorithms GAIL --envs walker2d --tuned --trajectories 25
run --algorithms GAIL --envs walker2d --tuned --trajectories 5
echo "=== queue5 done $(date +%H:%M:%S)" >> "$LOG"
