#!/bin/bash
# Round-4 GP/EI hyperparameter sweep (VERDICT #8): GAIL, hopper-only
# objective, 300k steps per trial on the v2 expert demos, 15 trials
# through the in-repo Sobol+GP-EI optimiser with early stopping
# disabled so the GP-acquisition path gets >=7 post-Sobol trials.
# A baseline "trial" with the default config runs first under the
# IDENTICAL harness, so "candidate beats default" is a same-protocol
# comparison read straight from the logs.
set -u
cd "$(dirname "$0")/.."
LOG=logs/sweep_gail_r4.log
ARGS="algorithm=GAIL env_backend=auto steps=300000 num_envs=256 evaluation.interval=30000 evaluation.episodes=30 logging.interval=0 imitation.trajectories=10 expert_data.source=data/hopper_expert_v2.npz"
# keep the round-3 6-trial demo sweep as its own artifact
if [ -d outputs/all_GAIL ] && [ ! -d outputs/all_GAIL_demo_r3 ]; then
  mv outputs/all_GAIL outputs/all_GAIL_demo_r3
fi
echo "=== baseline (default config, same harness) $(date +%H:%M:%S)" >> "$LOG"
timeout 2400 python train_all.py $ARGS seed=12345 --serial --envs hopper >> "$LOG" 2>&1
echo "--- rc=$? baseline" >> "$LOG"
echo "=== sweep 15 trials $(date +%H:%M:%S)" >> "$LOG"
timeout "${SWEEP_TIMEOUT:-14400}" python train_all.py $ARGS --sweep 15 --early-stop 15 --sobol 5 --serial --envs hopper >> "$LOG" 2>&1
echo "--- rc=$? sweep $(date +%H:%M:%S)" >> "$LOG"
