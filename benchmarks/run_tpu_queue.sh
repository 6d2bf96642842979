#!/bin/bash
# Ordered TPU work queue (remaining round-4 work; the pallas gate/A-B
# stages ran 2026-08-19 and settled the kernel as a documented negative —
# docs/BENCHMARKS.md). One TPU client at a time; each stage bounded;
# touch /tmp/tpu_queue.stop to stop cleanly between stages.
# Usage: bash benchmarks/run_tpu_queue.sh   (log: /tmp/tpu_queue.log)
cd "$(dirname "$0")/.."
# `python benchmarks/x.py` puts benchmarks/ (not the repo) on sys.path —
# ich_tpu must come from here; keep /root/.axon_site (the axon jax plugin).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_queue.log
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
# -- label-efficiency: contrastive third arm (VERDICT r3 item 4) --------------
# Seeds 49/48/42-45 measured 2026-08-19 (results merged in /tmp/le_multi);
# 46 died mid-run at a session restart, 47 never started.
for s in 46 47; do
  run 3000 python benchmarks/label_efficiency_bench.py \
      --seed "$s" --arms contrastive --out "/tmp/le_multi/seed$s"
done
run 1200 python benchmarks/label_efficiency_bench.py --report-only --out /tmp/le_multi
# -- 10%-labels rescue probe (VERDICT r3 item 5) -------------------------------
run 2700 python benchmarks/label_efficiency_bench.py \
    --seed 42 --rescue --arms scratch,pretrained --out /tmp/le_rescue/seed42
run 2700 python benchmarks/label_efficiency_bench.py \
    --seed 43 --rescue --arms scratch,pretrained --out /tmp/le_rescue/seed43
run 1200 python benchmarks/label_efficiency_bench.py --report-only --out /tmp/le_rescue
run 6600 python bench.py   # refreshed headline JSON (post-surgery tree)
echo "QUEUE DONE $(date)" | tee -a "$log"
