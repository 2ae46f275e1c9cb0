#!/bin/bash
# Round-4 validation queue, ordered by the round-3 VERDICT priorities:
#  1) AdRIL/SQIL/GAIL on the regenerated surviving expert demos
#     (data/hopper_expert_v2.npz — timeout-ended, norm>=0.95; VERDICT #2)
#  2) GAIL-hopper num_envs controls for the late-run decay (VERDICT #3:
#     at 256 envs the acting policy is stale by 256 updates vs the
#     reference's 1 — num_envs={64,16} isolates update-staleness)
#  3) GAIL multi-seed grid completion: seeds 2,3 x {ant,halfcheetah,
#     walker2d} (VERDICT #4)
#  4) walker2d trajectory dimension for GAIL+PWIL (VERDICT #6)
#  5) PWIL walker2d extra seeds (VERDICT #4, as budget allows)
# Stop cleanly: touch /tmp/stop_queue (in-flight run finishes, queue exits).
set -u
cd "$(dirname "$0")/.."
LOG=logs/validation_queue.log
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 19800 ))}  # default: +5.5h
run() {
  if [ -f /tmp/stop_queue ]; then echo "=== stop_queue present, exiting" >> "$LOG"; exit 0; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "=== deadline passed, exiting" >> "$LOG"; exit 0; fi
  echo "=== $(date +%H:%M:%S) validate $*" >> "$LOG"
  timeout "${RUN_TIMEOUT:-5400}" python scripts/validate_learning.py --steps "${RUN_STEPS:-1000000}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $*" >> "$LOG"
}
# VERDICT #2: the surviving-demos parity bar (AdRIL end-of-training >= 0.8)
run --algorithms AdRIL --envs hopper --dataset-suffix _v2
run --algorithms SQIL --envs hopper --dataset-suffix _v2
run --algorithms GAIL --envs hopper --tuned --dataset-suffix _v2
# VERDICT #3: decay controls (update staleness scales with num_envs)
run --algorithms GAIL --envs hopper --tuned --num-envs 64
# VERDICT #4: GAIL 3-seed x 4-env grid (hopper already has seeds 1-3)
run --algorithms GAIL --envs ant --tuned --seed 2
run --algorithms GAIL --envs halfcheetah --tuned --seed 2
run --algorithms GAIL --envs walker2d --tuned --seed 2
run --algorithms GAIL --envs ant --tuned --seed 3
run --algorithms GAIL --envs halfcheetah --tuned --seed 3
run --algorithms GAIL --envs walker2d --tuned --seed 3
# VERDICT #6: walker2d trajectory dimension
run --algorithms GAIL --envs walker2d --tuned --trajectories 25
run --algorithms GAIL --envs walker2d --tuned --trajectories 5
run --algorithms PWIL --envs walker2d --trajectories 25
run --algorithms PWIL --envs walker2d --trajectories 5
# VERDICT #3: second staleness point
run --algorithms GAIL --envs hopper --tuned --num-envs 16
# VERDICT #4: PWIL extra seeds (untuned: the canonical PWIL config —
# the tuned overlay regresses on the generated demos, RESULTS.md)
run --algorithms PWIL --envs walker2d --seed 2
run --algorithms PWIL --envs walker2d --seed 3
run --algorithms PWIL --envs ant --seed 2
run --algorithms PWIL --envs halfcheetah --seed 2
echo "=== queue6 done $(date +%H:%M:%S)" >> "$LOG"
