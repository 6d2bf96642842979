#!/bin/bash
# Round-5 timing benches — run AFTER run_tpu_queue_r5.sh drains and with the
# host otherwise quiet (the 1-core box's contention inflates latencies;
# bench.py now records loadavg in its JSON so conditions are provable).
# Usage: bash benchmarks/run_tpu_followup_r5.sh  (log: /tmp/tpu_followup_r5.log)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_followup_r5.log
: > "$log"
run() {
  if [ -e /tmp/tpu_queue.stop ]; then
    echo "STOP FILE PRESENT — skipping: ${*:2}" | tee -a "$log"
    return
  fi
  echo "=== ${*:2} === $(date)" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | grep --line-buffered -v "Warning" | tee -a "$log"
  local st=${PIPESTATUS[0]}
  echo "--- exit=$st$( [ "$st" = 124 ] && echo ' (TIMEOUT)' ) $(date) ---" | tee -a "$log"
}
# reference-scale supervised fold wall-clock (VERDICT r4 item 4)
run 3600 python benchmarks/fold_walltime_bench.py --epochs 100 --out /tmp/fold_walltime
# headline + 2.5D serving + telemetry capture (VERDICT r4 items 3 + 5)
run 6600 python bench.py
# wide-U-Net serving extension (round-4 notes: the remaining width lever)
run 2400 python benchmarks/wide_serving_probe.py
echo "FOLLOWUP R5 DONE $(date)" | tee -a "$log"
