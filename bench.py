"""Benchmark harness — prints ONE JSON line for the driver.

Protocol mirrors the reference's criterion benches (benches/ndrustfft.rs:
fft2d / rfft2d / dct2d on n x n arrays, transform along axis 0) on the
BASELINE.md metric: GFLOP/s using the 5*N*log2(N) convention for the 1024^2
C2C transform per axis.

``vs_baseline`` compares against XLA's own built-in FFT (jnp.fft) running the
identical computation on the same chip — the strongest available stand-in
baseline, since the reference publishes no numbers (BASELINE.md).

Usage: python bench.py [--cpu] [--all]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def _median_time(fn, *args, reps=5, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--all", action="store_true", help="run the full criterion-style grid")
    ap.add_argument("--n", type=int, default=1024)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ndrustfft_tpu import FftHandler, ndfft

    n = args.n
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)),
        dtype=jnp.complex64,
    )
    h = FftHandler(n)

    # reference bench shape: C2C along axis 0 of an n x n array
    ours = jax.jit(lambda v: ndfft(v, h, axis=0))
    t_ours = _median_time(ours, x)

    theirs = jax.jit(lambda v: jnp.fft.fft(v, axis=0))
    try:
        t_xla = _median_time(theirs, x)
    except Exception:
        t_xla = float("nan")

    flops = 5.0 * n * math.log2(n) * n  # 5 N log2 N per lane, n lanes
    gflops = flops / t_ours / 1e9
    gflops_xla = flops / t_xla / 1e9 if t_xla == t_xla else float("nan")
    vs = gflops / gflops_xla if gflops_xla == gflops_xla else 1.0

    if args.all:
        # the reference's full criterion grid (benches/ndrustfft.rs:6-7):
        # fft2d / rfft2d on n in {128,264,512,1024}, dct2d (DCT-I) on n+1
        from ndrustfft_tpu import DctHandler, R2cFftHandler, nddct1, ndfft_r2c

        for m in [128, 264, 512, 1024]:
            xc = jnp.asarray(
                rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m)),
                dtype=jnp.complex64)
            hm = FftHandler(m)
            t = _median_time(jax.jit(lambda v, _h=hm: ndfft(v, _h, axis=0)), xc)
            print(f"# fft2d n={m}: {t*1e6:.1f} us "
                  f"({5.0*m*math.log2(m)*m/t/1e9:.1f} GFLOP/s)", file=sys.stderr)
            xr = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32)
            hr = R2cFftHandler(m)
            t = _median_time(jax.jit(lambda v, _h=hr: ndfft_r2c(v, _h, axis=0)), xr)
            print(f"# rfft2d n={m}: {t*1e6:.1f} us", file=sys.stderr)
            d = m + 1
            xd = jnp.asarray(rng.standard_normal((d, d)), dtype=jnp.float32)
            hd = DctHandler(d)
            t = _median_time(jax.jit(lambda v, _h=hd: nddct1(v, _h, axis=0)), xd)
            print(f"# dct2d n={d}: {t*1e6:.1f} us", file=sys.stderr)

    print(json.dumps({
        "metric": f"fft2d_{n}_c2c_f32_axis0",
        "value": round(gflops, 2),
        "unit": "GFLOP/s (5NlogN)",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
