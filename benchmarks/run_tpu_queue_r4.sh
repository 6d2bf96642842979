#!/bin/bash
# Round-4 ordered TPU work queue (docs/ROUND4_NOTES.md). The overnight
# queue ran pre-Mosaic-fix kernel code against a compile helper that was
# 500ing after a host reboot; everything pallas must be re-measured at
# HEAD. One TPU client at a time; each stage bounded; touch
# /tmp/tpu_queue_r4.stop to stop cleanly between stages.
# Usage: bash benchmarks/run_tpu_queue_r4.sh   (log: /tmp/tpu_queue_r4.log)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_queue_r4.log
: > "$log"
run() {
  if [ -e /tmp/tpu_queue_r4.stop ]; then
    echo "STOP FILE PRESENT — skipping: ${*:2}" | tee -a "$log"
    return
  fi
  echo "=== ${*:2} === $(date)" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | grep --line-buffered -v "Warning" | tee -a "$log"
  local st=${PIPESTATUS[0]}
  echo "--- exit=$st$( [ "$st" = 124 ] && echo ' (TIMEOUT)' ) $(date) ---" | tee -a "$log"
}
# -- pallas kernel verdict (VERDICT r3 item 2) --------------------------------
run 2700 python benchmarks/pallas_conv_gate.py           # micro-gate, all shapes
run 2700 python benchmarks/pallas_in_net_ab.py           # 3D inference A/B
run 2700 python benchmarks/pallas_in_net_ab.py --train   # 3D train A/B
run 2700 python benchmarks/pallas_in_net_ab.py --train2d # 2D train A/B
run 1800 python benchmarks/pallas_in_net_ab.py --infer2d # 2D bs128 eval A/B
run 6600 python bench.py                                 # bank headline early
run 2700 python benchmarks/train_step_bench.py --only gan_bs64  # remat retry
# -- label-efficiency: contrastive third arm (VERDICT r3 item 4) --------------
for s in 49 48 42 43 44 45 46 47; do
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
echo "QUEUE DONE $(date)" | tee -a "$log"
