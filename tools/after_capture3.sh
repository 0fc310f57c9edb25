#!/bin/bash
# Follow-up batch: waits for tools/round3_capture.sh to finish (== DONE ==
# marker), then
#   1. A/B/A the fused-Bluestein lane tile at the prime-1021 bench row:
#      the round-3 capture measured 168.4 us under the new VMEM-budget tile
#      (256 at M=2048) vs the recorded 153.3 us at the old tile-128 floor —
#      but in DIFFERENT tunnel windows. Bracket default/128/default in one
#      window so drift can't masquerade as a tile effect.
#   2. Re-run bench.py --verify: the artifact now includes the DST family
#      (dst23_1024 roundtrip through the conjugated DCT kernels).
set -u
MAIN=${1:-/tmp/round3_capture.log}
OUT=${2:-/tmp/after_capture3.log}
cd "$(dirname "$0")/.."
while ! grep -q "== DONE ==" "$MAIN" 2>/dev/null; do sleep 60; done
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
export NDRUSTFFT_BENCH_SKIP_PROBE=1
run 1500 python bench.py --all --only fft2d_prime_1021_
run 1500 env NDRUSTFFT_TPU_PALLAS_TILE=128 python bench.py --all --only fft2d_prime_1021_
run 1500 python bench.py --all --only fft2d_prime_1021_
run 1500 python bench.py --verify
echo "== DONE ==" >>"$OUT"
