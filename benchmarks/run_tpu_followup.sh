#!/bin/bash
# Follow-up TPU queue: waits for an already-running queue (pid as $1) to
# exit, then runs the remaining round-4 probes — the contextual-attention
# block profile (VERDICT r3 item 6) and the >128 chunk-plan cost curve.
# One TPU client at a time is a hard platform constraint (CLAUDE.md), so
# this must never start while another queue holds the chip.
# Usage: bash benchmarks/run_tpu_followup.sh [pid-to-wait-for]
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_queue_followup.log
: > "$log"
if [ -n "$1" ]; then
  echo "waiting for pid $1 to exit... $(date)" | tee -a "$log"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "pid $1 gone $(date)" | tee -a "$log"
fi
run() {
  if [ -e /tmp/tpu_queue_followup.stop ]; then
    echo "STOP FILE PRESENT — skipping: ${*:2}" | tee -a "$log"
    return
  fi
  echo "=== ${*:2} === $(date)" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | grep --line-buffered -v "Warning" | tee -a "$log"
  local st=${PIPESTATUS[0]}
  echo "--- exit=$st$( [ "$st" = 124 ] && echo ' (TIMEOUT)' ) $(date) ---" | tee -a "$log"
}
run 2700 python benchmarks/ca_profile.py
run 2700 python benchmarks/chunk_shape_probe.py
echo "FOLLOWUP QUEUE DONE $(date)" | tee -a "$log"
