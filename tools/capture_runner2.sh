#!/bin/bash
# Health-gated capture runner, v2 — adds one retry round for steps killed
# mid-window (exit=124: the tunnel re-wedged DURING the step, so the work
# never ran to completion; everything else is a real result and is not
# retried). The tunnel is single-client: while this runner is live, no
# other process may touch the TPU — a foreground bench/probe from the
# driving session blocks the runner's probe and reads as "wedged"
# (observed 00:54-01:01 2026-08-21, NOTES_TPU.md).
#
# Usage:  bash tools/capture_runner2.sh <steps-file> [logfile]
# Steps file: one step per line,  TIMEOUT|CMD...   (# and blank skipped).
set -u
STEPS=$1
OUT=${2:-/tmp/capture_runner.log}
RETRY="${OUT%.log}.retry"
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

run_list() {
  local list=$1 allow_retry=$2
  while IFS='|' read -r t cmd; do
    case "$t" in ''|'#'*) continue;; esac
    if ! wait_healthy; then
      echo "-- gave up waiting for tunnel $(date -u +%H:%M:%S)" >>"$OUT"
      exit 1
    fi
    echo "== $(date -u +%H:%M:%S) $cmd ==" >>"$OUT"
    timeout "$t" bash -c "$cmd" >>"$OUT" 2>&1
    rc=$?
    echo "exit=$rc" >>"$OUT"
    if [ "$rc" = 124 ] && [ "$allow_retry" = 1 ]; then
      echo "$t|$cmd" >>"$RETRY"
      echo "-- step wedge-killed; queued for retry round" >>"$OUT"
    fi
  done <"$list"
}

: >>"$OUT"
: >"$RETRY"
run_list "$STEPS" 1
if [ -s "$RETRY" ]; then
  echo "== RETRY ROUND $(date -u +%H:%M:%S) ==" >>"$OUT"
  run_list "$RETRY" 0
fi
echo "== DONE $(date -u +%H:%M:%S) ==" >>"$OUT"
