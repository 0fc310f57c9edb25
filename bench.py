"""Benchmark harness — prints ONE JSON line for the driver.

Protocol mirrors the reference's criterion benches (benches/ndrustfft.rs:
fft2d / rfft2d / dct2d on n x n arrays, transform along axis 0) on the
BASELINE.md metric: GFLOP/s using the 5*N*log2(N) convention for the 1024^2
C2C transform per axis.

Measurement methodology (important): on this environment's tunneled TPU,
``block_until_ready`` does NOT reliably await remote execution, so naive
timing reports fantasy numbers (we measured a "4,400 TFLOP/s matmul").
Instead each measurement times a jit-compiled ``lax.fori_loop`` chain of K
data-dependent fft+ifft pairs followed by a forced scalar readback, at two
chain lengths; the slope gives the true per-transform time with the tunnel
round-trip subtracted out. Transient backend errors are retried.

``vs_baseline`` compares against XLA's own built-in FFT (jnp.fft) running
the identical chained computation on the same chip — the strongest available
stand-in baseline, since the reference publishes no numbers (BASELINE.md).

Usage: python bench.py [--cpu] [--all]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def _make_chain(step, x, K):
    """Jitted chained runner with an all-f32 program boundary: complex64
    arrays at jit boundaries are UNIMPLEMENTED over this environment's TPU
    tunnel, so complex values are split to (re, im) f32 pairs outside and
    rebuilt with lax.complex inside (XLA decomposes complex internally)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = np.asarray(x)  # stay on host; only f32 arrays cross the boundary
    is_cplx = np.issubdtype(x.dtype, np.complexfloating)

    @jax.jit
    def run(r, i):
        def body(_, c):
            v = step(jax.lax.complex(c[0], c[1]) if is_cplx else c[0])
            if jnp.issubdtype(v.dtype, jnp.complexfloating):
                return (jnp.real(v), jnp.imag(v))
            return (v, c[1])

        rr, ii = jax.lax.fori_loop(0, K, body, (r, i))
        return jnp.sum(jnp.abs(rr)) + jnp.sum(jnp.abs(ii))

    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32) if is_cplx
                     else np.zeros_like(x.real, dtype=np.float32))
    return lambda: float(run(xr, xi))


def _time_call(call, reps=3, retries=8):
    last = None
    for attempt in range(retries):
        try:
            call()  # warm (compiles on first use) + full sync
            if reps == 0:
                return 0.0
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                call()
                ts.append(time.perf_counter() - t0)
            return min(ts)
        except Exception as e:  # noqa: BLE001 - tunnel flake
            last = e
            time.sleep(min(30, 2**attempt))
    raise last


def _chain_time(step, x, K, reps=3, retries=8):
    return _time_call(_make_chain(step, x, K), reps=reps, retries=retries)


def per_transform(pair_step, x, K1=2, K2=34):
    """Seconds per single transform; pair_step applies fwd+inv (2 transforms)."""
    a = _chain_time(pair_step, x, K1)
    b = _chain_time(pair_step, x, K2)
    return max((b - a) / ((K2 - K1) * 2), 1e-9)


def compare(step_a, step_b, x, K1=2, K2=34, rounds=7):
    """(t_a, t_b, ratio t_b/t_a) from the HEALTHIEST paired round (minimum
    combined time): the two steps are measured back-to-back inside each
    round because the tunnel's throughput drifts on a minutes scale, and the
    healthiest round best reflects hardware capability (degraded windows
    inflate both sides 10-25x). The four chained programs are compiled ONCE
    and reused across rounds."""
    calls = [_make_chain(s, x, K) for s in (step_a, step_b) for K in (K1, K2)]
    a1c, a2c, b1c, b2c = calls[0], calls[1], calls[2], calls[3]
    for c in calls:  # compile everything up front
        _time_call(c, reps=0)
    ratios, tas, tbs = [], [], []
    for _ in range(rounds):
        try:
            a1 = _time_call(a1c, retries=3)
            b1 = _time_call(b1c, retries=3)
            a2 = _time_call(a2c, retries=3)
            b2 = _time_call(b2c, retries=3)
        except Exception:  # noqa: BLE001 - skip a wedged round
            continue
        ta = (a2 - a1) / ((K2 - K1) * 2)
        tb = (b2 - b1) / ((K2 - K1) * 2)
        if ta <= 0 or tb <= 0:  # drift noise swamped this round
            continue
        tas.append(ta)
        tbs.append(tb)
        ratios.append(tb / ta)
    if not ratios:
        return None, None, None  # every round failed / drift-swamped
    # report the HEALTHIEST paired round (min combined time): the goal is
    # hardware capability, not the median of tunnel weather — degraded
    # windows inflate both sides 10-25x and scramble even the ratio
    best = min(range(len(ratios)), key=lambda r: tas[r] + tbs[r])
    return tas[best], tbs[best], ratios[best]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--all", action="store_true",
                    help="run the full criterion-style grid")
    ap.add_argument("--n", type=int, default=1024)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ndrustfft_tpu import FftHandler, ndfft, ndifft

    n = args.n
    rng = np.random.default_rng(0)
    # host-side numpy; _chain_time splits to f32 before upload
    x = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
         ).astype(np.complex64)
    h = FftHandler(n)

    # reference bench shape: C2C along axis 0 of an n x n array; ours and
    # the jnp.fft baseline measured interleaved (paired healthiest round).
    # The tunnel degrades for minutes at a time (10-25x inflation): retry
    # the whole comparison when the result smells degraded.
    sane = 30.0 * (2.0 * n * n * 8) / 819e9  # 30x the HBM-roofline estimate
    t_ours = t_xla = vs = None
    for attempt in range(3):
        try:
            t_ours, t_xla, vs = compare(
                lambda v: ndifft(ndfft(v, h, axis=0), h, axis=0),
                lambda v: jnp.fft.ifft(jnp.fft.fft(v, axis=0), axis=0),
                x)
        except Exception:
            t_ours = t_xla = vs = None
        if t_ours is not None and t_ours < sane:
            break
        if attempt < 2:
            time.sleep(45)
    if t_ours is None:
        try:
            t_ours = per_transform(
                lambda v: ndifft(ndfft(v, h, axis=0), h, axis=0), x)
        except Exception:
            t_ours = None
        vs = None  # comparison unmeasurable — do NOT fabricate parity

    flops = 5.0 * n * math.log2(n) * n  # 5 N log2 N per lane, n lanes
    # sub-10ns per transform is physically impossible: flag as unmeasured
    gflops = (flops / t_ours / 1e9
              if t_ours is not None and t_ours > 1e-8 else None)

    if args.all:
        # the reference's full criterion grid (benches/ndrustfft.rs:6-7)
        from ndrustfft_tpu import (
            DctHandler, R2cFftHandler, nddct1, nddct2, nddct3, ndfft_r2c,
            ndifft_r2c,
        )

        for m in [128, 264, 512, 1024]:
            xc = (rng.standard_normal((m, m))
                  + 1j * rng.standard_normal((m, m))).astype(np.complex64)
            hm = FftHandler(m)
            t = per_transform(
                lambda v, _h=hm: ndifft(ndfft(v, _h, axis=0), _h, axis=0), xc)
            print(f"# fft2d n={m}: {t*1e6:.1f} us "
                  f"({5.0*m*math.log2(m)*m/t/1e9:.1f} GFLOP/s)", file=sys.stderr)
            xr = rng.standard_normal((m, m)).astype(np.float32)
            hr = R2cFftHandler(m)
            t = per_transform(
                lambda v, _h=hr: ndifft_r2c(ndfft_r2c(v, _h, axis=0), _h,
                                            axis=0), xr)
            print(f"# rfft2d n={m}: {t*1e6:.1f} us", file=sys.stderr)
            d = m + 1
            xd = rng.standard_normal((d, d)).astype(np.float32)
            hd = DctHandler(d)
            t = per_transform(
                lambda v, _h=hd, _d=d: nddct3(nddct2(v, _h, axis=0), _h,
                                              axis=0) / (2.0 * _d), xd)
            print(f"# dct2d-II/III n={d}: {t*1e6:.1f} us", file=sys.stderr)
            # the reference's dct2d group benches DCT-I (self-inverse scaled)
            t = per_transform(
                lambda v, _h=hd, _d=d: nddct1(nddct1(v, _h, axis=0), _h,
                                              axis=0) / (2.0 * (_d - 1)), xd)
            print(f"# dct2d-I n={d}: {t*1e6:.1f} us", file=sys.stderr)

    print(json.dumps({
        "metric": f"fft2d_{n}_c2c_f32_axis0",
        "value": round(gflops, 2) if gflops is not None else None,
        "unit": "GFLOP/s (5NlogN)",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
