#!/bin/bash
# Headline-bench A/B over the round-2 perf knobs (run on a FREE chip —
# the validation queue must be stopped first). Appends one JSON line per
# config to logs/bench_ab.log.
set -u
cd "$(dirname "$0")/.."
LOG=logs/bench_ab.log
run() {
  local name="$1"; shift
  echo "=== $(date +%H:%M:%S) $name" >> "$LOG"
  env "$@" timeout 900 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? $name" >> "$LOG"
}
run xla-512
run pallas-512 BENCH_PALLAS=1
run pallas-1024 BENCH_PALLAS=1 BENCH_NUM_ENVS=1024
echo "=== bench A/B done" >> "$LOG"
