"""Attribution timing for the axis-mid twostep kernel: where do the
microseconds go?

Times STRIPPED variants of the kernel body on the real chip; deltas between
consecutive variants attribute cost to each dataflow component. All variants
share an identical chain apparatus (carry-scale pass + unused-out forcing via
optimization_barrier), so deltas cancel the apparatus.

Usage: python tools/attrib_axis_mid.py <variant> [n] [B] [tile]
Variants (cumulative dataflow prefixes):
  copy    — block in -> block out (DMA + grid floor)
  entry   — + (1,n,tl) -> (m, f*tl) entry reshape
  s1      — + bf16x3 K-stacked stage-1 dot (contract m)
  s1tw    — + in-VMEM twiddle build + complex multiply
  s1twT   — + (m, f*tl) -> (f, tl, m) mid transpose
  nos2    — + exit swap/merge to (1, n, tl)   [stage-2 dot skipped]
  full    — + stage-2 K-stacked dot (the production kernel body)

One variant per process: a failed TPU program poisons the session
(NOTES_TPU.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
tile_arg = int(sys.argv[4]) if len(sys.argv) > 4 else 256

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ndrustfft_tpu.ops.pallas.fft import (  # noqa: E402
    _ks_complex_dot, _twostep_consts, dot_mode,
)

cols = n
m, f = _twostep_consts(n, -1, np.float32)[1]
tl = tile_arg
mode = dot_mode()


def _bs(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _swapped_s1(xr, xi, wr, wi):
    """stage-1 bf16x3 dot with OUT = (N, 2p): dot_general(x6, w6) — the
    mid transpose disappears (out sublanes are already (j, l))."""
    xhr, xlr = _bs(xr)
    xhi_, xli_ = _bs(xi)
    x6 = jnp.concatenate([xhr, xlr, xhr, xhi_, xli_, xhi_], axis=0)
    whr, wlr = _bs(wr)
    whi, wli = _bs(wi)
    w_re = jnp.concatenate([whr, whr, wlr, -whi, -whi, -wli], axis=0)
    w_im = jnp.concatenate([whi, whi, wli, whr, whr, wlr], axis=0)
    w6 = jnp.concatenate([w_re, w_im], axis=1)        # (6m, 2p)
    return jax.lax.dot_general(x6, w6, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


_C = 0.7071067811865476


def _bfly8(y, sign):
    """8-point DFT over the leading dim of (8, cols, m) (re, im) plane
    pairs via 3 radix-2 DIF levels on the VPU; natural output order."""
    yr, yi = y
    s = -1.0 if sign < 0 else 1.0   # W^1 = (C, s*C) with W = e^{s 2pi i/8}

    def cm(r, i, a, b):             # complex multiply by scalar (a, b)
        return r * a - i * b, r * b + i * a

    # level 1: span 4, twiddles W^k on the bottom half
    t = [(yr[k], yi[k]) for k in range(4)]
    b = [(yr[k], yi[k]) for k in range(4, 8)]
    top = [(tr + br, ti + bi) for (tr, ti), (br, bi) in zip(t, b)]
    dif = [(tr - br, ti - bi) for (tr, ti), (br, bi) in zip(t, b)]
    tw1 = [(1.0, 0.0), (_C, s * _C), (0.0, s), (-_C, s * _C)]
    bot = [cm(r, i, a, bb) for (r, i), (a, bb) in zip(dif, tw1)]

    def four(g):                    # 4-point DIF on a list of 4 pairs
        (a0, b0), (a1, b1), (a2, b2), (a3, b3) = g
        u0 = (a0 + a2, b0 + b2)
        u1 = (a1 + a3, b1 + b3)
        d0 = (a0 - a2, b0 - b2)
        d1 = cm(a1 - a3, b1 - b3, 0.0, s)    # * W^2 = (0, s)
        # level 3: pairs (u0,u1) and (d0,d1); outputs bit-reversed q
        return [(u0[0] + u1[0], u0[1] + u1[1]),
                (u0[0] - u1[0], u0[1] - u1[1]),
                (d0[0] + d1[0], d0[1] + d1[1]),
                (d0[0] - d1[0], d0[1] - d1[1])]

    e = four(top)   # q even: [0, 4, 2, 6]
    o = four(bot)   # q odd:  [1, 5, 3, 7]
    order = {0: e[0], 4: e[1], 2: e[2], 6: e[3],
             1: o[0], 5: o[1], 3: o[2], 7: o[3]}
    zr = jnp.concatenate([order[q][0][None] for q in range(8)], axis=0)
    zi = jnp.concatenate([order[q][1][None] for q in range(8)], axis=0)
    return zr, zi


def body(xr_ref, xi_ref, *refs):
    consts = [r[:] for r in refs[:-3]]
    or_ref, oi_ref, probe_ref = refs[-3:]
    (wm_r, wm_i, tws_r, tws_i, wf_r, wf_i) = consts
    probe_ref[:] = jnp.full((1, 8, 128), xr_ref[0, 0, 0], jnp.float32)
    if variant == "bfly":
        # swapped stage-1 + VPU radix-2 butterflies for the f=8 combine
        # (replaces the M=16,K=48 padded MXU dot)
        xr2 = xr_ref[:].reshape(m, f * tl)
        xi2 = xi_ref[:].reshape(m, f * tl)
        out = _swapped_s1(xr2, xi2, wm_r, wm_i)       # (f*tl, 2m)
        y = out.reshape(f, tl, 2 * m)
        yr, yi = y[:, :, :m], y[:, :, m:]
        twr = tws_r.T.reshape(f, 1, m)
        twi = tws_i.T.reshape(f, 1, m)
        yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
        zr, zi = _bfly8((yr, yi), -1)                 # (q, tl, m)
        or_ref[:] = jnp.swapaxes(zr, 1, 2).reshape(1, n, tl)
        oi_ref[:] = jnp.swapaxes(zi, 1, 2).reshape(1, n, tl)
        return
    if variant == "swapfull":
        # full kernel with the swapped stage-1 orientation: no mid transpose
        xr2 = xr_ref[:].reshape(m, f * tl)
        xi2 = xi_ref[:].reshape(m, f * tl)
        out = _swapped_s1(xr2, xi2, wm_r, wm_i)       # (f*tl, 2m)
        y = out.reshape(f, tl, 2 * m)
        yr, yi = y[:, :, :m], y[:, :, m:]
        twr = tws_r.T.reshape(f, 1, m)
        twi = tws_i.T.reshape(f, 1, m)
        yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
        zr, zi = _ks_complex_dot(yr, yi, wf_r, wf_i, mode)   # (q, tl, m)
        or_ref[:] = jnp.swapaxes(zr, 1, 2).reshape(1, n, tl)
        oi_ref[:] = jnp.swapaxes(zi, 1, 2).reshape(1, n, tl)
        return
    if variant == "copy":
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]
        return
    xr2 = xr_ref[:].reshape(m, f * tl)
    xi2 = xi_ref[:].reshape(m, f * tl)
    if variant == "entry":
        or_ref[:] = xr2.reshape(1, m, f * tl)
        oi_ref[:] = xi2.reshape(1, m, f * tl)
        return
    yr, yi = _ks_complex_dot(xr2, xi2, wm_r, wm_i, mode)
    if variant == "s1":
        or_ref[:] = yr.reshape(1, m, f * tl)
        oi_ref[:] = yi.reshape(1, m, f * tl)
        return
    tw_r = jnp.broadcast_to(tws_r[:, :, None], (m, f, tl)).reshape(m, f * tl)
    tw_i = jnp.broadcast_to(tws_i[:, :, None], (m, f, tl)).reshape(m, f * tl)
    yr, yi = yr * tw_r - yi * tw_i, yr * tw_i + yi * tw_r
    if variant == "s1tw":
        or_ref[:] = yr.reshape(1, m, f * tl)
        oi_ref[:] = yi.reshape(1, m, f * tl)
        return
    yr = yr.T.reshape(f, tl, m)
    yi = yi.T.reshape(f, tl, m)
    if variant == "s1twT":
        or_ref[:] = yr.reshape(1, f * tl, m)
        oi_ref[:] = yi.reshape(1, f * tl, m)
        return
    if variant == "full":
        zr, zi = _ks_complex_dot(yr, yi, wf_r, wf_i, mode)
    else:  # nos2
        zr, zi = yr, yi
    or_ref[:] = jnp.swapaxes(zr, 1, 2).reshape(1, n, tl)
    oi_ref[:] = jnp.swapaxes(zi, 1, 2).reshape(1, n, tl)


OUT_BLOCKS = {
    "copy": (1, n, tl), "entry": (1, m, f * tl), "s1": (1, m, f * tl),
    "s1tw": (1, m, f * tl), "s1twT": (1, f * tl, m),
    "nos2": (1, n, tl), "full": (1, n, tl), "swapfull": (1, n, tl),
    "bfly": (1, n, tl),
}


def build():
    consts, _ = _twostep_consts(n, -1, np.float32)
    gc = pl.cdiv(cols, tl)
    grid = (B, gc)
    in_spec = pl.BlockSpec((1, n, tl), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    ob = OUT_BLOCKS[variant]
    out_shape = (B, ob[1], ob[2] * gc)
    out_spec = pl.BlockSpec(ob, lambda b, i: (b, 0, i),
                            memory_space=pltpu.VMEM)
    probe_spec = pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda b, i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        body,
        out_shape=(jax.ShapeDtypeStruct(out_shape, jnp.float32),
                   jax.ShapeDtypeStruct(out_shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec, probe_spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return lambda xr, xi: call(xr, xi, *consts)


def make_chain(K):
    run_kernel = build()

    @jax.jit
    def run(r, i):
        def it(k, c):
            r_, i_, acc = c
            _, _, probe = run_kernel(r_, i_)
            s = (1.0 / np.sqrt(n)) * (1.0 + 1e-6 * jnp.float32(k))
            # the probe sum is a REAL data dependence: optimization_barrier
            # alone was DCE'd through (measured — the kernels never ran)
            return (r_ * s, i_ * s, acc + jnp.sum(probe))

        rr, ii, acc = jax.lax.fori_loop(0, K, it, (r, i, jnp.float32(0)))
        return jnp.sum(jnp.abs(rr)) + jnp.sum(jnp.abs(ii)) + acc

    return run


rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal((B, n, cols)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((B, n, cols)).astype(np.float32))

K1, K2 = 2, 34
c1, c2 = make_chain(K1), make_chain(K2)


def t(call, reps=3):
    float(call(xr, xi))  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(xr, xi))
        ts.append(time.perf_counter() - t0)
    return min(ts)


a, b = t(c1), t(c2)
per_iter = (b - a) / (K2 - K1)
print(json.dumps({
    "variant": variant, "n": n, "B": B, "tile": tl, "m": m, "f": f,
    "us_per_transform": round(per_iter / B * 1e6, 2),
}))
