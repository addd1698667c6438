#!/bin/bash
# Stop the r5 sweep once 4 trials are recorded (time-boxed cut: the arms need
# the TPU). Capture the just-spawned next trial's pid via the parent-child
# relation (no pattern kills), kill the parent between trials, then SIGTERM
# the child so it checkpoints and exits before heavy device traffic.
set -u
RESULTS=runs/sweep_r5/sweep_results.jsonl
SWEEP_PID=${1:?sweep python pid}
TIMEOUT_PID=${2:-}
while [ "$(wc -l < "$RESULTS" 2>/dev/null || echo 0)" -lt 4 ]; do
  kill -0 "$SWEEP_PID" 2>/dev/null || { echo "sweep already gone" >> runs/sweep_r5/stop.log; exit 0; }
  sleep 10
done
CHILDREN=$(ps --ppid "$SWEEP_PID" -o pid= 2>/dev/null)
kill "$SWEEP_PID" 2>/dev/null
[ -n "$TIMEOUT_PID" ] && kill "$TIMEOUT_PID" 2>/dev/null
sleep 2
for pid in $CHILDREN; do
  kill "$pid" 2>/dev/null   # SIGTERM -> trainer checkpoints + exits cleanly
done
echo "sweep stopped after 4 trials at $(date -u +%H:%M:%S); children: $CHILDREN" >> runs/sweep_r5/stop.log
