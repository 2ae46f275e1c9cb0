#!/bin/bash
# Round-3 validation queue, ordered by the round-2 VERDICT priorities:
#   1. AdRIL/SQIL num_envs controls (isolate batched-env freshness from
#      semantics; VERDICT next-round #1) — all under the reference eval
#      protocol (30 episodes / 10k steps) and the new diag_* relabeller
#      instrumentation.
#   2. walker2d untuned PWIL/GMMIL (Weak #3: tuned-only cells were broken;
#      hopper showed tuned overlays REGRESS these methods).
#   3. Trajectory-count dimension {5,25} on the strongest methods (VERDICT #2).
#   4. Multi-seed on the headline GAIL/PWIL cells (VERDICT #2, C22 CI input).
#   5. Tuned-overlay regression reruns at seed 2 (VERDICT #4).
#   6. SAC at the reference 3e6-step horizon (VERDICT #6).
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
# Phase 1 — AdRIL/SQIL batching controls
run --algorithms AdRIL --envs hopper --num-envs 16
run --algorithms AdRIL --envs hopper --num-envs 256 --rerun
# Phase 2 — walker2d untuned (tuned-overlay suspicion)
run --algorithms PWIL --envs walker2d
run --algorithms GMMIL --envs walker2d
run --algorithms SQIL --envs hopper --num-envs 16
# Phase 3 — trajectory dimension, hopper
run --algorithms GAIL --envs hopper --tuned --trajectories 25
run --algorithms GAIL --envs hopper --tuned --trajectories 5
run --algorithms PWIL --envs hopper --trajectories 25
run --algorithms PWIL --envs hopper --trajectories 5
run --algorithms BC --envs hopper --trajectories 25
run --algorithms BC --envs hopper --trajectories 5
# Phase 4 — multi-seed headline cells
run --algorithms GAIL --envs hopper --tuned --seed 2
run --algorithms GAIL --envs hopper --tuned --seed 3
run --algorithms PWIL --envs hopper --seed 2
run --algorithms PWIL --envs hopper --seed 3
# Phase 5 — tuned-overlay regression reruns
run --algorithms GMMIL --envs hopper --tuned --seed 2
run --algorithms DRIL --envs hopper --tuned --seed 2
run --algorithms PWIL --envs hopper --tuned --seed 2
# Phase 6 — SAC reference horizon
RUN_STEPS=3000000 RUN_TIMEOUT=12000 run --algorithms SAC --envs hopper --eval-interval 30000
# Phase 7 — trajectory dimension, walker2d + AdRIL traj dim
run --algorithms GAIL --envs walker2d --tuned --trajectories 25
run --algorithms GAIL --envs walker2d --tuned --trajectories 5
run --algorithms BC --envs walker2d --trajectories 25
run --algorithms BC --envs walker2d --trajectories 5
run --algorithms AdRIL --envs hopper --trajectories 25
run --algorithms AdRIL --envs hopper --trajectories 5
echo "=== queue5 done $(date +%H:%M:%S)" >> "$LOG"
