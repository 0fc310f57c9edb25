#!/bin/bash
# Round-4 on-chip capture batch — the BASELINE.md round-4 grid.
#
# Each step is its OWN process (a failed TPU program poisons the session,
# NOTES_TPU.md) and is timeout-bounded so a re-wedged tunnel can't hang the
# batch. Usage:  bash tools/round4_capture.sh [logfile]
#
# Round-4 deltas this batch must evidence:
#   * donate_io in-place pages (headline protocol; 87.2% roofline capture
#     2026-08-19 morning window — re-captured here for same-window grid
#     consistency)
#   * Bluestein inverse-core trim + zero-aware pad butterflies (primes:
#     509 19.6-18.1 us, 1021 104.7-107.6 us in two pre-batch windows vs
#     23.6/129.3 no-trim same-window A/B)
#   * the round-3 verdict item-9 rows: DST pair, DCT-IV 2048, f64-emulate,
#     dct2d_23_2049 engine A/B (the trim also cuts the 2049 rr kernels)
set -u
OUT=${1:-/tmp/round4_capture.log}
cd "$(dirname "$0")/.."
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
# 1. compile-check: the trimmed/zero-aware chirp-z kernels must compile on
#    real Mosaic (their stage shapes changed: f*p_trim exit rows, live-row
#    pad entry)
run 2400 python bench.py --compile-check
export NDRUSTFFT_BENCH_SKIP_PROBE=1
# 2. re-runnable on-chip numeric artifact (saved as VERIFY_r04.json)
run 1200 python bench.py --verify
# 3. headline (donate_io protocol; JSON carries nodonate + unfused + floor)
run 1500 python bench.py
# 4. prime rows: the trim numbers of record
run 1500 python bench.py --all --only fft2d_prime_509_
run 1800 python bench.py --all --only fft2d_prime_1021_
# 5. the 2049 outlier: trimmed rr kernels + same-window engine A/B row
run 2700 python bench.py --all --only dct2d_23_2049_,dct2d_23_2049_engine
# 6. verdict item-9 capability rows
run 1500 python bench.py --all --only dst2d_23_1024_
# dct2d_4_2048_ substring-matches BOTH the kernel-route row and its
# same-window engine A/B row (dct2d_4_2048_engine)
run 2700 python bench.py --all --only dct2d_4_2048_
run 1200 python bench.py --all --only fft1d_f64emulate_
# 7. core grid (sizes 128..1024 x 4 families) — regression watch vs round 3
run 3000 python bench.py --all --only fft2d_128_,fft2d_264_,fft2d_512_,fft2d_1024_
run 3000 python bench.py --all --only rfft2d_
run 3000 python bench.py --all --only dct2d_23_129_,dct2d_23_265_,dct2d_23_513_,dct2d_23_1025_
run 3000 python bench.py --all --only dct2d_23_128_,dct2d_23_264_,dct2d_23_512_,dct2d_23_1024_
run 3000 python bench.py --all --only dct2d_1_129_,dct2d_1_265_,dct2d_1_513_,dct2d_1_1025_
# 8. long + DCT-I 2049 + par rows
run 1800 python bench.py --all --only fft1d_long_
run 1800 python bench.py --all --only dct2d_1_2049_
run 1200 python bench.py --all --only fft2d_par_1024_
echo "== DONE ==" >>"$OUT"
