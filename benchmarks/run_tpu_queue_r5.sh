#!/bin/bash
# Round-5 ordered TPU work queue — the two statistical loose ends from
# VERDICT r4 (items 1 + 2). One TPU client at a time; each stage bounded;
# touch /tmp/tpu_queue.stop to stop cleanly between stages.
# Usage: bash benchmarks/run_tpu_queue_r5.sh   (log: /tmp/tpu_queue_r5.log)
#
# Stage A (VERDICT r4 item 1): the LOCAL(+global) contrastive arm of the
#   label-efficiency benchmark, seeds 42-49. Each seed dir is seeded with
#   the committed round-4 snapshot (docs/label_efficiency_seedNN.json) so
#   the new arm merges next to the already-measured scratch/CR/contrastive
#   values and pairs against scratch at the same (seed, fold).
# Stage B (VERDICT r4 item 2): 10%-labels rescue probe, seeds 44-49
#   (42/43 measured round 4 — docs/label_efficiency_rescue_seedNN.json),
#   taking the pooled rescue n from 10 toward 40.
cd "$(dirname "$0")/.."
# `python benchmarks/x.py` puts benchmarks/ (not the repo) on sys.path —
# ich_tpu must come from here; keep /root/.axon_site (the axon jax plugin).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log=/tmp/tpu_queue_r5.log
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
# -- Stage A: contrastive_local arm, all 8 committed seeds --------------------
for s in 42 43 44 45 46 47 48 49; do
  mkdir -p "/tmp/le_r5/seed$s"
  if [ ! -e "/tmp/le_r5/seed$s/results.json" ]; then
    cp "docs/label_efficiency_seed$s.json" "/tmp/le_r5/seed$s/results.json"
  fi
  run 3600 python benchmarks/label_efficiency_bench.py \
      --seed "$s" --arms contrastive_local --out "/tmp/le_r5/seed$s"
done
run 1200 python benchmarks/label_efficiency_bench.py --report-only --out /tmp/le_r5
# -- Stage B: rescue probe seeds 44-49 ----------------------------------------
for s in 44 45 46 47 48 49; do
  mkdir -p "/tmp/le_rescue_r5/seed$s"
  run 2700 python benchmarks/label_efficiency_bench.py \
      --seed "$s" --rescue --arms scratch,pretrained --out "/tmp/le_rescue_r5/seed$s"
done
# pool with the committed round-4 rescue seeds for the final statistics
# (pooled_report globs */results.json, so every seed goes in a subdir)
for s in 42 43; do
  mkdir -p "/tmp/le_rescue_all/seed$s"
  cp "docs/label_efficiency_rescue_seed$s.json" "/tmp/le_rescue_all/seed$s/results.json"
done
for s in 44 45 46 47 48 49; do
  if [ -e "/tmp/le_rescue_r5/seed$s/results.json" ]; then
    mkdir -p "/tmp/le_rescue_all/seed$s"
    cp "/tmp/le_rescue_r5/seed$s/results.json" "/tmp/le_rescue_all/seed$s/"
  fi
done
run 1200 python benchmarks/label_efficiency_bench.py --report-only --out /tmp/le_rescue_all
echo "QUEUE R5 DONE $(date)" | tee -a "$log"
