#!/bin/bash
# TPU-tunnel recovery watcher (VERDICT r3 item 1b: keep this in the repo,
# not /tmp — a reboot must not lose the auto-recovery path).
#
# The axon TPU tunnel (/root/.tpu_init.py, a driver-managed stdio relay)
# can die entirely and is not restartable from inside the box. This
# watcher probes it every ~9 min with a tiny jitted fetch; on the first
# success it launches the ordered TPU work queue exactly once.
#
#   Usage:  nohup bash benchmarks/tpu_watch_queue.sh [queue-script] \
#               >/tmp/tpu_watch_queue.log 2>&1 &
#   Probe log: /tmp/tpu_watch_queue.log   Queue log: /tmp/tpu_queue.log
#
# One TPU client at a time: the probe itself is a client, so the watcher
# must NOT run while other TPU work is in flight — it checks for an
# existing queue run and exits rather than stacking clients.
set -u
cd "$(dirname "$0")/.."
QUEUE="${1:-benchmarks/run_tpu_queue.sh}"

if pgrep -f "bash $QUEUE" >/dev/null 2>&1; then
  echo "queue already running; watcher not needed" && exit 0
fi

probe=0
while :; do
  probe=$((probe + 1))
  echo "=== probe $probe $(date) ==="
  # A fresh-process first fetch can take 1-8 min when healthy; a dead
  # tunnel blocks forever — bound the probe at 15 min.
  if timeout 900 python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.bfloat16))
print("probe ok:", float(x[0, 0]))
EOF
  then
    echo "=== tunnel up; launching $QUEUE $(date) ==="
    bash "$QUEUE"
    echo "=== queue finished $(date) ==="
    exit 0
  fi
  echo "--- probe $probe failed $(date); sleeping ---"
  sleep 540
done
