#!/bin/bash
# TPU tunnel recovery watcher (VERDICT r3 "next round" item 1b).
#
# The axon tunnel dies for hours at a time (docs/ROUND4_NOTES.md
# "Environment incidents"): this watcher probes with a tiny bounded
# matmul fetch every ~9 min and, the moment a probe succeeds, launches
# the ordered TPU work queue (benchmarks/run_tpu_queue.sh) exactly once.
#
# Usage:   nohup bash benchmarks/tpu_watch_queue.sh >/tmp/tpu_watch_queue.log 2>&1 &
#          echo $! > /tmp/tpu_watch_queue.pid     # stop: kill $(cat ...pid)
# Logs:    /tmp/tpu_watch_queue.log (probes), /tmp/tpu_queue.log (queue).
#
# One TPU client at a time: the probe itself is the only client while
# waiting, and the queue only starts after the probe process has exited.
cd "$(dirname "$0")/.."
PROBE='
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("PROBE_OK", float((x @ x)[0, 0]), flush=True)
'
while true; do
  echo "probe $(date)"
  if timeout 900 python -c "$PROBE" 2>&1 | grep -q PROBE_OK; then
    echo "TUNNEL UP $(date) — launching queue"
    bash benchmarks/run_tpu_queue.sh
    echo "WATCHER DONE $(date)"
    exit 0
  fi
  sleep 540
done
