#!/bin/bash
# Round-3 pending on-chip captures — run in one healthy tunnel window.
#
# Each step is its OWN process (a failed TPU program poisons the session,
# NOTES_TPU.md) and is timeout-bounded so a re-wedged tunnel can't hang the
# batch. Usage:  bash tools/round3_capture.sh [logfile]
#
# Steps (in priority order, cheapest health signal first):
#   1. compile-check      — the new Bluestein VMEM-budget tile (commit
#                           5728564) must compile on real Mosaic
#   2. --verify           — the re-runnable on-chip numeric artifact
#   3. prime rows 509/1021 — A/B the new blue tile vs the recorded
#                           29.23 / 153.3 us (tile-128 floor)
#   4. dct2d_23_2049      — pending: odd DCT pair beyond the dense cap
#   5. fft2d_par_1024     — pending: single-chip _par == serial pin
#   6. fused_ifft default / MID_SPLIT=256 / default again — an A/B/A
#      sandwich: the honest m=256 bts2 measurement (BASELINE.md correction
#      of record) bracketed by two default runs so tunnel-bandwidth drift
#      within the window can't masquerade as a variant effect
set -u
OUT=${1:-/tmp/round3_capture.log}
cd "$(dirname "$0")/.."
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
run 2400 python bench.py --compile-check
# the first step probed the window; later steps skip the ~30s re-probe
# (each still has its own timeout if the tunnel re-wedges mid-batch)
export NDRUSTFFT_BENCH_SKIP_PROBE=1
run 1200 python bench.py --verify
run 1200 python bench.py --all --only fft2d_prime_509_
run 1500 python bench.py --all --only fft2d_prime_1021_
run 1500 python bench.py --all --only dct2d_23_2049_
run 1200 python bench.py --all --only fft2d_par_1024_
run 1200 python tools/time_kernels.py fused_ifft 1024 16
run 1200 env NDRUSTFFT_TPU_MID_SPLIT=256 python tools/time_kernels.py fused_ifft 1024 16
run 1200 python tools/time_kernels.py fused_ifft 1024 16
#   7. n=264 lane-tile sweep — the 264 grid row is the only one far off
#      the copy floor (7.51 us vs ~2 us, round-3 grid); attribution:
#      dense-body lane-padding waste (264 = 2x128 + 8; the old 512 budget
#      tile runs 1.94x the dot FLOPs of the 384 single block). The default
#      is now the _mid_tile cols-granule clamp (384); legs: default (384),
#      TILE=512 (the knob clamps to the full 264 extent - the exact-block
#      variant; the OLD oversized-512 default is the recorded 7.51 us grid
#      row), TILE=128 (3 partial blocks), default again - bracketing so
#      window drift can't masquerade as a variant effect.
run 900 python tools/time_kernels.py fused_ifft 264 16
run 900 env NDRUSTFFT_TPU_PALLAS_TILE=512 python tools/time_kernels.py fused_ifft 264 16
run 900 env NDRUSTFFT_TPU_PALLAS_TILE=128 python tools/time_kernels.py fused_ifft 264 16
run 900 python tools/time_kernels.py fused_ifft 264 16
run 1200 python bench.py --all --only fft2d_264_
#   8. r2c/dct mid lane-tile cap — the C2C axis-mid builders measured
#      tile 512 11-22% faster than 256 at n=1024 (two controlled windows);
#      the r2c/dct mid builders still run a flat 256 cap. A/B/A each:
#      default (256), TILE=512, default. Raise the cap in code only if
#      512 wins here too.
run 900 python tools/time_kernels.py r2c_mid 1024 16
run 900 env NDRUSTFFT_TPU_PALLAS_TILE=512 python tools/time_kernels.py r2c_mid 1024 16
run 900 python tools/time_kernels.py r2c_mid 1024 16
run 900 python tools/time_kernels.py dct_mid 1024 16
run 900 env NDRUSTFFT_TPU_PALLAS_TILE=512 python tools/time_kernels.py dct_mid 1024 16
run 900 python tools/time_kernels.py dct_mid 1024 16
echo "== DONE ==" >>"$OUT"
