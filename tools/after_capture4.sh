#!/bin/bash
# Third-stage batch: waits for tools/after_capture3.sh to finish, then
# retries the one row the main batch lost to its timeout:
#   dct2d_23_2049 — odd DCT-II/III pair beyond the dense cap; the lowering
#   compiles several Bluestein sub-programs (2049 = 3*683, M=4096) and the
#   tunnel's remote compiles exceeded the generic 1500s budget. 2700s here.
set -u
PREV=${1:-/tmp/after_capture3.log}
OUT=${2:-/tmp/after_capture4.log}
cd "$(dirname "$0")/.."
while ! grep -q "== DONE ==" "$PREV" 2>/dev/null; do sleep 60; done
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
export NDRUSTFFT_BENCH_SKIP_PROBE=1
run 2700 python bench.py --all --only dct2d_23_2049_
echo "== DONE ==" >>"$OUT"
