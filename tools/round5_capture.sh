#!/bin/bash
# Round-5 on-chip capture batch — the hardening-round evidence set.
#
# Each step is its OWN process (a failed TPU program poisons the session,
# NOTES_TPU.md) and is timeout-bounded so a re-wedged tunnel can't hang the
# batch. Usage:  bash tools/round5_capture.sh [logfile]
#
# Round-5 deltas this batch must evidence:
#   * per-row SAME-WINDOW aliased copy floors across the WHOLE criterion
#     grid (verdict next #1): every --all row now carries copy_floor_us /
#     pct_copy_floor, incl. the rfft and dct pair rows and the primes
#   * donating DCT-II / dense-DCT / DCT-I kernels (new this round)
#   * fft2d_2048 smooth row: the primes' FLOP-envelope comparison point
#     (verdict next #5)
#   * --verify artifact covering grad_c2c_1024 + the new jvp wrapper on
#     real (non-interpret) kernels (ADVICE #5)
#   * per-kernel compile seconds in --compile-check (verdict next #8) and
#     the cold/warm persistent-cache table (tools/compile_latency.py)
set -u
OUT=${1:-/tmp/round5_capture.log}
cd "$(dirname "$0")/.."
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
# 1. compile-check with per-row compile seconds (the latency table source)
run 3000 python bench.py --compile-check
export NDRUSTFFT_BENCH_SKIP_PROBE=1
# 2. on-chip numeric artifact (covers grad + the new custom_jvp wrapper
#    over real Mosaic kernels) — saved as VERIFY_r05.json
run 1500 python bench.py --verify
# 3. headline (donate_io protocol; JSON carries nodonate + unfused + floors)
run 1500 python bench.py
# 4. core grid with per-row floors — the verdict-next-#1 capture
run 3600 python bench.py --all --only fft2d_128_,fft2d_264_,fft2d_512_,fft2d_1024_
run 3600 python bench.py --all --only rfft2d_
run 3600 python bench.py --all --only dct2d_23_129_,dct2d_23_265_,dct2d_23_513_,dct2d_23_1025_
run 3600 python bench.py --all --only dct2d_23_128_,dct2d_23_264_,dct2d_23_512_,dct2d_23_1024_
run 3600 python bench.py --all --only dct2d_1_129_,dct2d_1_265_,dct2d_1_513_,dct2d_1_1025_
# 5. primes + the smooth-2048 envelope row (same window = the FLOP defense)
run 2400 python bench.py --all --only fft2d_prime_509_,fft2d_prime_1021_,fft2d_2048_
# 6. Bluestein-DCT outlier with floor + engine A/B
run 3000 python bench.py --all --only dct2d_23_2049_,dct2d_23_2049_engine
# 7. remaining capability rows (regression watch)
run 1800 python bench.py --all --only dst2d_23_1024_
run 2700 python bench.py --all --only dct2d_4_2048_
run 1500 python bench.py --all --only fft1d_f64emulate_
run 1800 python bench.py --all --only fft1d_long_
run 1800 python bench.py --all --only dct2d_1_2049_
run 1200 python bench.py --all --only fft2d_par_1024_
# 8. cold/warm compile-latency table (fresh subprocesses; needs no probe)
run 3600 python tools/compile_latency.py
echo "== DONE ==" >>"$OUT"
