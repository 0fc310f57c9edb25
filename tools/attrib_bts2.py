"""Attribution timing for the bts2 axis-mid C2C kernel: where do the
remaining microseconds over the DMA floor go, and do the candidate exits
beat the production (q,p')->(p',q) sublane permute?

Unlike tools/attrib_axis_mid.py (side-branch apparatus — hides relayout
cost under DMA slack, NOTES_TPU.md round-2 lesson), every variant here is
a DEPENDENT fused chain (v <- kernel(v), drift-neutral scale baked into
the constants), the same protocol as the bench's fused chains.

Usage: python tools/attrib_bts2.py <variant> [n] [B] [tile]
Variants:
  copy   — out = 1.001*in, same block specs (chain DMA + grid floor)
  full   — production bts2 body (exit = concat axis0 + (1,0,2) transpose)
  exitb  — bts2 with the exit built by stacking the f per-q parts on the
           MIDDLE axis: parts (m,1,L) -> (m,f,L) -> reshape (n,L); row
           p'*f + q == k, numerically identical to `full`
  noexit — bts2 with NO interleave (plain (f*m,L) reshape — WRONG numerics,
           rows permuted; timing-only bound for a zero-cost exit)
  dense  — ONE n x n K-stacked complex DFT dot (zero relayouts, ~8x the
           MXU MACs of two-step at n=1024; wins iff DMA/compute overlap)
  copym  — merged-plane copy: re/im ride ONE (B, 2n, L) array (rows 0..n-1
           = re, n..2n-1 = im), HALF the DMA descriptors of `copy` at the
           same bytes — probes whether the floor is descriptor-bound
  fullm  — production bts2 body with the merged-plane I/O of copym
One variant per process: a failed TPU program poisons the session.
Prints one JSON line {variant, n, tile, us_per_transform, gflops}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
tl = int(sys.argv[4]) if len(sys.argv) > 4 else 512

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ndrustfft_tpu.ops.pallas.fft import (  # noqa: E402
    _VMEM_LIMIT, _bts2_consts, _ks_complex_dot, bfly_dft_leading,
    dot_mode, ks_w6_np,
)
from ndrustfft_tpu.plan import dft_matrix  # noqa: E402

cols = n
mode = dot_mode()
sign = -1
scale = 1.001 / math.sqrt(n)
dtype = np.float32


def _bts2_planes(xr, xi, consts, m, f, tile):
    """Shared bts2 prefix: stage-1 butterfly + per-q twiddle-folded dots.
    Returns the f per-q (m, L) result pairs."""
    xr3 = xr.reshape(f, m, tile)
    xi3 = xi.reshape(f, m, tile)
    planes = bfly_dft_leading([(xr3[a], xi3[a]) for a in range(f)], sign)
    outs = []
    for q in range(f):
        ar, ai = planes[q]
        if mode == "bf16x3":
            outs.append(_ks_complex_dot(ar, ai, None, None, mode,
                                        w6=consts[q]))
        else:
            outs.append(_ks_complex_dot(ar, ai, consts[2 * q],
                                        consts[2 * q + 1], mode))
    return outs


def kbody_m(which, m, f, tile, x_ref, *refs):
    """Merged-plane body: one (1, 2n, TL) in/out block."""
    consts = [r[:] for r in refs[:-1]]
    o_ref = refs[-1]
    x2 = x_ref[:].reshape(2 * n, tile)
    xr, xi = x2[:n], x2[n:]
    if which == "copym":
        o_ref[:] = (1.001 * x2).reshape(1, 2 * n, tile)
        return
    outs = _bts2_planes(xr, xi, consts, m, f, tile)
    zr = jnp.concatenate([pr[None] for pr, _ in outs], axis=0)
    zi = jnp.concatenate([pi[None] for _, pi in outs], axis=0)
    zr = jnp.transpose(zr, (1, 0, 2)).reshape(n, tile)
    zi = jnp.transpose(zi, (1, 0, 2)).reshape(n, tile)
    o_ref[:] = jnp.concatenate([zr, zi], axis=0).reshape(1, 2 * n, tile)


def kbody(which, m, f, tile, xr_ref, xi_ref, *refs):
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    xr = xr_ref[:].reshape(n, tile)
    xi = xi_ref[:].reshape(n, tile)
    if which == "copy":
        or_ref[:] = (1.001 * xr).reshape(1, n, tile)
        oi_ref[:] = (1.001 * xi).reshape(1, n, tile)
        return
    if which == "dense":
        zr, zi = _ks_complex_dot(xr, xi, None, None, mode, w6=consts[0]) \
            if mode == "bf16x3" else \
            _ks_complex_dot(xr, xi, consts[0], consts[1], mode)
        or_ref[:] = zr.reshape(1, n, tile)
        oi_ref[:] = zi.reshape(1, n, tile)
        return
    outs = _bts2_planes(xr, xi, consts, m, f, tile)
    if which == "full":
        zr = jnp.concatenate([pr[None] for pr, _ in outs], axis=0)
        zi = jnp.concatenate([pi[None] for _, pi in outs], axis=0)
        zr = jnp.transpose(zr, (1, 0, 2)).reshape(n, tile)
        zi = jnp.transpose(zi, (1, 0, 2)).reshape(n, tile)
    elif which == "exitb":
        zr = jnp.concatenate([pr[:, None] for pr, _ in outs],
                             axis=1).reshape(n, tile)
        zi = jnp.concatenate([pi[:, None] for _, pi in outs],
                             axis=1).reshape(n, tile)
    elif which == "noexit":
        zr = jnp.concatenate([pr for pr, _ in outs], axis=0)
        zi = jnp.concatenate([pi for _, pi in outs], axis=0)
    else:
        raise SystemExit(f"unknown variant {which}")
    or_ref[:] = zr.reshape(1, n, tile)
    oi_ref[:] = zi.reshape(1, n, tile)


def build():
    if variant in ("copy", "copym"):
        consts = [np.zeros((8, 128), dtype)]  # dummy, keeps arity uniform
        m = f = 0
    elif variant == "dense":
        wr_, wi_ = dft_matrix(n, sign)
        if mode == "bf16x3":
            consts = [ks_w6_np(wr_ * scale, wi_ * scale)]
        else:
            consts = [np.asarray(wr_ * scale, dtype),
                      np.asarray(wi_ * scale, dtype)]
        m = f = 0
    else:
        consts, (m, f) = _bts2_consts(n, sign, np.dtype(dtype), mode, scale)
    gc = pl.cdiv(cols, tl)
    grid = (B * gc,)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    kw = dict(
        grid=grid,
        cost_estimate=pl.CostEstimate(
            flops=int(10.0 * n * math.log2(n) * B * cols),
            bytes_accessed=int(4 * B * cols * n * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )
    if variant.endswith("m"):
        spec = pl.BlockSpec((1, 2 * n, tl), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            partial(kbody_m, variant, m, f, tl),
            out_shape=jax.ShapeDtypeStruct((B, 2 * n, cols), jnp.float32),
            in_specs=[spec] + const_specs, out_specs=spec, **kw)
        return lambda x: call(x, *[jnp.asarray(c) for c in consts])
    spec = pl.BlockSpec((1, n, tl), lambda g: (g // gc, 0, g % gc),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(kbody, variant, m, f, tl),
        out_shape=(jax.ShapeDtypeStruct((B, n, cols), jnp.float32),
                   jax.ShapeDtypeStruct((B, n, cols), jnp.float32)),
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec), **kw)
    return lambda xr, xi: call(xr, xi, *[jnp.asarray(c) for c in consts])


run_call = build()


merged = variant.endswith("m")


def make_chain(K):
    if merged:
        @jax.jit
        def chainm(x):
            y = jax.lax.fori_loop(0, K, lambda _, c: run_call(c), x)
            return jnp.sum(jnp.abs(y))

        return chainm

    @jax.jit
    def chain(r, i):
        def it(_, c):
            return run_call(c[0], c[1])

        rr, ii = jax.lax.fori_loop(0, K, it, (r, i))
        return jnp.sum(jnp.abs(rr)) + jnp.sum(jnp.abs(ii))

    return chain


K1, K2 = 34, 134
c1, c2 = make_chain(K1), make_chain(K2)
rng = np.random.default_rng(0)
if merged:
    args = (jnp.asarray(rng.standard_normal((B, 2 * n, cols)), jnp.float32),)
else:
    args = (jnp.asarray(rng.standard_normal((B, n, cols)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, n, cols)), jnp.float32))

probe = float(c1(*args))  # compile + sanity (finite => chain is neutral)
assert math.isfinite(probe), probe
assert math.isfinite(float(c2(*args)))


def timed(call, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# interleave to share window drift; SLOPE cancels fixed per-call overhead
# (tunnel dispatch latency), which can dwarf the chain itself in degraded
# windows (measured: a copy chain "floor" of 110 us/transform at K=34 vs
# the known healthy 28 us floor)
t1, t2 = timed(c1), timed(c2)
t = (t2 - t1) / ((K2 - K1) * B)
print(json.dumps({
    "variant": variant, "n": n, "B": B, "tile": tl, "mode": mode,
    "us_per_transform": round(t * 1e6, 2),
    "us_k34_apparent": round(t1 / (K1 * B) * 1e6, 2),
    "gflops": round(5.0 * n * math.log2(n) * cols / t / 1e9, 1),
    "probe": probe,
}))
