#!/bin/bash
# Health-gated capture runner — the round-5b/5c batches kept stalling when
# the axon tunnel re-wedged MID-batch (each step then burns its full
# timeout hanging on the first device op; a 12-step batch can eat hours).
# This runner probes tunnel health in a disposable subprocess BEFORE every
# step and sleeps through wedged windows instead of burning step timeouts.
#
# Usage:  bash tools/capture_runner.sh <steps-file> [logfile]
# Steps file: one step per line,  TIMEOUT|CMD...   (lines starting with #
# and blank lines skipped). Steps run in order, each its own process.
set -u
STEPS=$1
OUT=${2:-/tmp/capture_runner.log}
cd "$(dirname "$0")/.."
export NDRUSTFFT_BENCH_SKIP_PROBE=1

probe() {
  timeout 75 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform not in ("cpu",), d
import jax.numpy as jnp
x = jnp.ones((8, 8), jnp.float32)
assert float((x @ x).sum()) == 512.0
EOF
}

wait_healthy() {
  for i in $(seq 1 200); do
    if probe; then return 0; fi
    echo "-- wedged $(date -u +%H:%M:%S), sleeping" >>"$OUT"
    sleep 120
  done
  return 1
}

: >>"$OUT"
while IFS='|' read -r t cmd; do
  case "$t" in ''|'#'*) continue;; esac
  if ! wait_healthy; then
    echo "-- gave up waiting for tunnel $(date -u +%H:%M:%S)" >>"$OUT"
    exit 1
  fi
  echo "== $(date -u +%H:%M:%S) $cmd ==" >>"$OUT"
  timeout "$t" bash -c "$cmd" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
done <"$STEPS"
echo "== DONE $(date -u +%H:%M:%S) ==" >>"$OUT"
