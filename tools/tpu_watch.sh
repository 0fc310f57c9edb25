#!/bin/bash
# Tunnel watcher — probe the TPU every PERIOD seconds; on the first healthy
# window, fire the pending capture batch (tools/round3_capture.sh) exactly
# once, then exit. Designed to run as a detached background task for hours
# while the tunnel is wedged (NOTES_TPU.md: wedges last hours; even
# jax.devices() hangs, so the probe itself is timeout-bounded in a child
# process).
#
# Usage: bash tools/tpu_watch.sh [capture-logfile] [period-seconds]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round3_capture.log}
PERIOD=${2:-180}
STATE=/tmp/tpu_watch.status
echo "watching (period=${PERIOD}s) $(date -u +%H:%M:%S)" >"$STATE"
while true; do
  if timeout 75 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform not in ("cpu",), d
# a trivial program must also complete: a wedged tunnel sometimes lists
# devices but hangs on execution
import jax.numpy as jnp
x = jnp.ones((8, 8), jnp.float32)
assert float((x @ x).sum()) == 512.0
EOF
  then
    echo "tpu healthy $(date -u +%H:%M:%S) — firing capture" >>"$STATE"
    touch /tmp/tpu_up
    bash tools/round3_capture.sh "$LOG"
    echo "capture done $(date -u +%H:%M:%S)" >>"$STATE"
    exit 0
  fi
  echo "wedged $(date -u +%H:%M:%S)" >>"$STATE"
  sleep "$PERIOD"
done
