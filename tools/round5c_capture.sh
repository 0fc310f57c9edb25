#!/bin/bash
# Round-5c on-chip batch — evidence for the round-5 fused spectral
# pipelines (ndspectral_r2c / ndspectral_dct) and the refreshed verify
# artifact that covers them.
#
# Each step is its OWN process (a failed TPU program poisons the session,
# NOTES_TPU.md) and timeout-bounded. Fire after round5b completes.
# Usage:  bash tools/round5c_capture.sh [logfile]
set -u
OUT=${1:-/tmp/round5c_capture.log}
cd "$(dirname "$0")/.."
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
export NDRUSTFFT_BENCH_SKIP_PROBE=1

# 1. compile-check: the 6 new probes (spectral kernels + m=64 splits) on
#    real Mosaic, plus the full regression matrix
run 3600 python bench.py --compile-check

# 2. refreshed on-chip verify artifact (adds spectral_r2c_1024 and
#    spectral_dct_1024 roundtrips over real kernels)
run 1800 python bench.py --verify

# 3. fused-pipeline rows, interleaved with their unfused pair twins in the
#    SAME window (the honest fusion delta)
run 2400 python bench.py --all --only rfft2d_1024_,spectral_r2c_1024_
run 2400 python bench.py --all --only dct2d_23_1024_,spectral_dct_1024_
run 2400 python bench.py --all --only rfft2d_512_,spectral_r2c_512_
run 2400 python bench.py --all --only dct2d_23_512_,spectral_dct_512_
run 2400 python bench.py --all --only fft2d_1024_,spectral_c2c_1024_
run 2400 python bench.py --all --only fft2d_512_,spectral_c2c_512_
echo "== DONE ==" >>"$OUT"
