#!/bin/bash
# Dynamic validation queue: pops the FIRST line of $JOBS (default
# queue_jobs.txt), runs it as validate_learning.py args, repeats. The
# jobs file can be edited (reordered, extended) at ANY time — each job
# is re-read from disk after the previous one finishes, unlike a static
# script which bash reads by byte offset. Lines starting with # are
# dropped. RAW: prefix runs the rest of the line as a shell command
# instead (e.g. bench scripts between validations).
# Stop cleanly: touch /tmp/stop_queue (in-flight run finishes).
set -u
cd "$(dirname "$0")/.."
JOBS=${JOBS:-queue_jobs.txt}
LOG=logs/validation_queue.log
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 19800 ))}
while :; do
  if [ -f /tmp/stop_queue ]; then echo "=== stop_queue present, exiting" >> "$LOG"; exit 0; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then echo "=== deadline passed, exiting" >> "$LOG"; exit 0; fi
  [ -s "$JOBS" ] || { echo "=== jobs file empty, exiting $(date +%H:%M:%S)" >> "$LOG"; exit 0; }
  # Atomic pop under flock: an edit landing between the head and the mv
  # would otherwise be silently discarded (and two runner instances would
  # duplicate/lose jobs). ALL edits to the jobs file (appends included)
  # must hold the same lock: flock queue_jobs.txt.lock -c 'echo JOB >> queue_jobs.txt'.
  job=$(
    flock "$JOBS.lock" bash -c '
      head -n 1 "$0"
      tail -n +2 "$0" > "$0.tmp" && mv "$0.tmp" "$0"
    ' "$JOBS"
  )
  case "$job" in
    ''|'#'*) continue ;;
    RAW:*)
      cmd=${job#RAW:}
      echo "=== $(date +%H:%M:%S) raw $cmd" >> "$LOG"
      timeout "${RUN_TIMEOUT:-5400}" bash -c "$cmd" >> "$LOG" 2>&1
      echo "--- rc=$? raw $cmd" >> "$LOG"
      ;;
    *)
      echo "=== $(date +%H:%M:%S) validate $job" >> "$LOG"
      timeout "${RUN_TIMEOUT:-5400}" python scripts/validate_learning.py --steps "${RUN_STEPS:-1000000}" $job >> "$LOG" 2>&1
      echo "--- rc=$? $job" >> "$LOG"
      ;;
  esac
done
