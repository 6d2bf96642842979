#!/bin/bash
# Ordered TPU work queue for the next session with a live tunnel
# (docs/ROUND4_NOTES.md). One TPU client at a time; each stage bounded.
# Usage: bash benchmarks/run_tpu_queue.sh   (log: /tmp/tpu_queue.log)
cd "$(dirname "$0")/.."
# `python benchmarks/x.py` puts benchmarks/ (not the repo) on sys.path —
# ich_tpu must come from here; keep /root/.axon_site (the axon jax plugin).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_queue.log
: > "$log"
run() {
  echo "=== ${*:2} === $(date)" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | grep --line-buffered -v "Warning" | tee -a "$log"
  local st=${PIPESTATUS[0]}
  echo "--- exit=$st$( [ "$st" = 124 ] && echo ' (TIMEOUT)' ) $(date) ---" | tee -a "$log"
}
run 2700 python benchmarks/pallas_conv_gate.py          # 7-shape micro-gate
run 2700 python benchmarks/pallas_in_net_ab.py          # 3D inference A/B
run 2700 python benchmarks/pallas_in_net_ab.py --train  # 3D train A/B
run 2700 python benchmarks/pallas_in_net_ab.py --train2d # 2D train A/B
run 1800 python benchmarks/pallas_in_net_ab.py --infer2d # 2D bs128 eval A/B
run 2700 python benchmarks/train_step_bench.py --only gan_bs64  # remat bs64
run 1800 python benchmarks/infer_overhead_probe.py      # GN share at b128 64^3
run 6600 python bench.py   # headline JSON (watchdog hard cap 100 min)
# Remaining time: pool two more label-efficiency seeds (~55 min each),
# then refresh the aggregate report over all seed dirs in /tmp/le_multi.
run 4500 python benchmarks/label_efficiency_bench.py --seed 48 --out /tmp/le_multi/seed48
run 4500 python benchmarks/label_efficiency_bench.py --seed 49 --out /tmp/le_multi/seed49
run 1200 python benchmarks/label_efficiency_bench.py --report-only --out /tmp/le_multi
echo "QUEUE DONE $(date)" | tee -a "$log"
