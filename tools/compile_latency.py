"""Cold/warm compile-latency measurement — the serving recipe, with numbers.

Round-5 verdict next #8: big Pallas kernels cost 20-40 s of Mosaic compile
on the real toolchain (BASELINE.md round-3 pathology note), so a serving
deployment must know (a) what a cold first call costs per transform family
and (b) how much `utils.cache.enable_persistent_cache` +
`handler.warmup()` recover on restart.

Protocol: the same worker program runs in THREE fresh subprocesses —

  1. cold      — no persistent cache: full trace + Mosaic compile
  2. seed      — persistent cache enabled, empty dir: pays cold cost once
                 and writes the cache entries
  3. warm      — persistent cache enabled, seeded dir: first call hits the
                 on-disk XLA cache (trace + deserialize only)

Each worker times `handler.warmup(shape)` per family (the documented
serving recipe: one blocking call that compiles forward AND inverse and
populates the jit dispatch cache) and prints one JSON line; the parent
aggregates a cold/warm table. Run on the real TPU for the numbers of
record; on CPU it measures the interpret-mode path (still validates the
recipe end-to-end).

Usage: python tools/compile_latency.py [--n 1024] [--cols 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(n: int, cols: int, cache_dir: str | None):
    import time

    sys.path.insert(0, _REPO)
    if cache_dir:
        from ndrustfft_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache(cache_dir, min_compile_seconds=0.0)

    from ndrustfft_tpu import DctHandler, FftHandler, R2cFftHandler

    shape = (2, n, cols)
    out = {}
    for fam, h in (("c2c", FftHandler(n)),
                   ("r2c", R2cFftHandler(n)),
                   ("dct", DctHandler(n))):
        t0 = time.perf_counter()
        h.warmup(shape, axis=1)
        out[fam] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--cols", type=int, default=256)
    ap.add_argument("--worker-cache", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker:
        _worker(args.n, args.cols, args.worker_cache)
        return

    cache = tempfile.mkdtemp(prefix="ndrustfft_xla_cache_")

    def run_leg(name, cache_dir):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--n", str(args.n), "--cols", str(args.cols)]
        if cache_dir:
            cmd += ["--worker-cache", cache_dir]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                           cwd=_REPO)
        if r.returncode != 0:
            print(json.dumps({"leg": name, "error": r.stderr[-400:]}),
                  flush=True)
            return None
        times = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps({"leg": name, "warmup_seconds": times}), flush=True)
        return times

    try:
        cold = run_leg("cold_no_cache", None)
        seed = run_leg("cold_seed_cache", cache)
        warm = run_leg("warm_from_cache", cache)
        if cold and warm:
            speedup = {k: round(cold[k] / max(warm[k], 1e-9), 1)
                       for k in cold}
            print(json.dumps({"leg": "summary", "cold": cold,
                              "seed": seed, "warm": warm,
                              "cold_over_warm": speedup}), flush=True)
    finally:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
