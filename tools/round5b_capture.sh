#!/bin/bash
# Round-5b on-chip batch — (a) the prime-row re-run (the 5a step hung on a
# wedged tunnel and produced zero rows), (b) the m=64 stage-split A/B/A
# (config.dct_split / rfft_split / mid_split = 64 vs per-n default), and
# (c) a fresh headline window.
#
# Each step is its OWN process (a failed TPU program poisons the session,
# NOTES_TPU.md) and timeout-bounded. The split probes interleave
# A (default), B (split=64), A (default) inside one tunnel window because
# tunnel throughput drifts minute-to-minute (NOTES_TPU.md) — a B row is a
# win only if it beats BOTH A rows.
# Usage:  bash tools/round5b_capture.sh [logfile]
set -u
OUT=${1:-/tmp/round5b_capture.log}
cd "$(dirname "$0")/.."
run() {
  local t=$1; shift
  echo "== $(date -u +%H:%M:%S) $* [${SPLIT_TAG:-}] ==" >>"$OUT"
  timeout "$t" "$@" >>"$OUT" 2>&1
  echo "exit=$?" >>"$OUT"
}
: >"$OUT"
export NDRUSTFFT_BENCH_SKIP_PROBE=1

# 1. primes + smooth-2048 envelope (the hung 5a step)
run 2400 python bench.py --all --only fft2d_prime_509_,fft2d_prime_1021_
run 1800 python bench.py --all --only fft2d_2048_

# 2. m=64 split A/B/A — DCT-II/III pair (split applies at n: 512->f8, 1024->f16)
SPLIT_TAG=dctA run 2400 python bench.py --all --only dct2d_23_512_,dct2d_23_1024_
SPLIT_TAG=dctB run 2400 env NDRUSTFFT_TPU_DCT_SPLIT=64 \
  python bench.py --all --only dct2d_23_512_,dct2d_23_1024_
SPLIT_TAG=dctA2 run 2400 python bench.py --all --only dct2d_23_512_,dct2d_23_1024_

# 3. m=64 split A/B/A — rfft pair (split applies at h=n/2: 512->f4, 1024->f8)
SPLIT_TAG=rfftA run 2400 python bench.py --all --only rfft2d_512_,rfft2d_1024_
SPLIT_TAG=rfftB run 2400 env NDRUSTFFT_TPU_RFFT_SPLIT=64 \
  python bench.py --all --only rfft2d_512_,rfft2d_1024_
SPLIT_TAG=rfftA2 run 2400 python bench.py --all --only rfft2d_512_,rfft2d_1024_

# 3b. fused spectral pipeline rows — same window as the rfft pair rows
# above (the delta vs rfft2d_{m} is the spectrum HBM round-trip + carry
# copy, both eliminated by the fused same-shape kernel)
run 2400 python bench.py --all --only spectral_r2c_512_,spectral_r2c_1024_

# 4. m=64 split A/B/A — C2C mid (mid_split honors 64 now: 512->f8, 1024->f16)
SPLIT_TAG=c2cA run 2400 python bench.py --all --only fft2d_512_,fft2d_1024_
SPLIT_TAG=c2cB run 2400 env NDRUSTFFT_TPU_MID_SPLIT=64 \
  python bench.py --all --only fft2d_512_,fft2d_1024_
SPLIT_TAG=c2cA2 run 2400 python bench.py --all --only fft2d_512_,fft2d_1024_

# 5. m=64 split A/B — DCT-IV 2048 (split applies at n/2=1024)
SPLIT_TAG=dct4A run 2700 python bench.py --all --only dct2d_4_2048_
SPLIT_TAG=dct4B run 2700 env NDRUSTFFT_TPU_DCT_SPLIT=64 \
  python bench.py --all --only dct2d_4_2048_

# 6. fresh headline window
run 1500 python bench.py
echo "== DONE ==" >>"$OUT"
