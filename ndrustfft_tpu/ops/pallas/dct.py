"""Fused Pallas kernels for DCT-II / DCT-III (SURVEY.md §7.4d).

Both types collapse to a REAL-input n-point FFT with constants folded at
build time, so the whole transform is one kernel pass (read n reals, write
n reals — half a C2C's HBM traffic) built on the twostep dataflow:

  DCT-II   y = Re( w ⊙ FFT_n(v) ),  v = Makhoul permutation of x
           (v is real, so FFT_n(v) is Hermitian and the reference lowering's
           half-spectrum unfold is unnecessary — compute the full FFT with a
           REAL-input first stage: 2 dots instead of 3, cheaper than the
           unfold pass it replaces)
  DCT-III  z = unperm( Re( FFT_n(c ⊙ pre) ) ),  c = x with x0 halved
           pre[t] = e^{-i pi t/(2n)} is SEPARABLE over the twostep index
           split t = t'*f + j:  pre = a[t'] * b[j], so a folds into the
           stage-1 DFT matrix and b into the stage twiddle — the kernel
           input stays REAL and no pre-multiply pass exists at all.

The Makhoul (un)permutations are slice/flip/concats done by XLA at the
kernel boundary (flips are not Mosaic-representable): DCT-II takes the even
samples and the REVERSED odd samples as two input refs and concats along
lanes in-kernel; DCT-III emits head/tail output refs that XLA interleaves.

Supported: even n with a {128,256} twostep split, f32. Other shapes fall
back to the XLA lowering in ops/dct.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from ...plan import _cis, dft_matrix, stage_twiddle
from .fft import (
    _MAX_N,
    _VMEM_LIMIT,
    _dg,
    _ks_complex_dot,
    _ks_real_dot,
    _lane_tile,
    _twostep_split,
    dot_mode,
)


def dct_pallas_supported(n: int, dtype) -> bool:
    if not config.use_pallas:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 2 or n > _MAX_N or n % 2:
        return False
    ts = _twostep_split(n)
    if ts is None or ts[0] > config.max_base_radix:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def _real_twostep(v, consts, m, f, tl, mode, real_out_only):
    """FFT_n of a REAL (T, n) tile via the twostep dataflow with (possibly
    complex-folded) stage-1 weights; returns (zr, zi) or zr only."""
    (wm_r, wm_i, tws_r, tws_i, wf_r, wf_i) = consts
    n = m * f
    tw_r = jnp.broadcast_to(tws_r[:, :, None], (m, f, tl)).reshape(m, f * tl)
    tw_i = jnp.broadcast_to(tws_i[:, :, None], (m, f, tl)).reshape(m, f * tl)
    x2 = v.T.reshape(m, f * tl)
    # real input: complex-weight x real-value, one K-stacked dot
    yr, yi = _ks_real_dot(x2, wm_r, wm_i, mode)
    yr, yi = yr * tw_r - yi * tw_i, yr * tw_i + yi * tw_r
    yr = yr.T.reshape(f, tl, m)
    yi = yi.T.reshape(f, tl, m)
    if real_out_only:
        # Re(sum_j wf[j,q] y[j]): K-stack [y_re; y_im] against [wf_r; -wf_i]
        if mode == "bf16x3":
            zr, _ = _ks_complex_dot(yr, yi, wf_r, wf_i, mode)
        else:
            def con(x, w):
                return _dg(w, x, (((0,), (0,)), ((), ())), mode)

            zr = con(yr, wf_r) - con(yi, wf_i)
        return jnp.transpose(zr, (1, 0, 2)).reshape(tl, n), None
    zr, zi = _ks_complex_dot(yr, yi, wf_r, wf_i, mode)
    return (jnp.transpose(zr, (1, 0, 2)).reshape(tl, n),
            jnp.transpose(zi, (1, 0, 2)).reshape(tl, n))


def _dct2_kernel(m, f, tl, mode, ne, xe_ref, xor_ref, *refs):
    consts = [r[:] for r in refs[:-3]]
    w_r = refs[-3][:]               # (1, n) post twiddle, k-ordered
    w_i = refs[-2][:]
    out_ref = refs[-1]
    v = jnp.concatenate([xe_ref[:], xor_ref[:]], axis=-1)   # Makhoul perm
    zr, zi = _real_twostep(v, consts, m, f, tl, mode, real_out_only=False)
    out_ref[:] = zr * w_r - zi * w_i


def _dct3_kernel(m, f, tl, mode, x_ref, *refs):
    consts = [r[:] for r in refs[:-3]]
    h0 = refs[-3][:]                # (1, n) x0-halving mask
    ev_ref, od_ref = refs[-2:]
    c = x_ref[:] * h0
    zr, _ = _real_twostep(c, consts, m, f, tl, mode, real_out_only=True)
    half = zr.shape[-1] // 2
    ev_ref[:] = zr[:, :half]
    od_ref[:] = zr[:, half:]


def _fft_consts(n: int, sign: int, dtype, pre_a=None, pre_b=None):
    """Twostep consts [wm_r, wm_i, tw_r(m,f), tw_i, wf_r, wf_i]; optionally
    folds a separable input twiddle a[t'] (into Wm rows) and b[j] (into the
    stage twiddle columns)."""
    m, f = _twostep_split(n)
    wm_r, wm_i = dft_matrix(m, sign)
    if pre_a is not None:
        ar, ai = pre_a  # (m,)
        wm_r, wm_i = (wm_r * ar[:, None] - wm_i * ai[:, None],
                      wm_r * ai[:, None] + wm_i * ar[:, None])
    tw = stage_twiddle(f, m, sign)          # (f, m)[j, p]
    tw_r, tw_i = tw[0].T.copy(), tw[1].T.copy()   # (m, f)[p, j]
    if pre_b is not None:
        br, bi = pre_b  # (f,)
        tw_r, tw_i = (tw_r * br[None, :] - tw_i * bi[None, :],
                      tw_r * bi[None, :] + tw_i * br[None, :])
    wf = dft_matrix(f, sign)
    return m, f, [np.asarray(c, dtype) for c in
                  (wm_r, wm_i, tw_r, tw_i, wf[0], wf[1])]


def _tile(n, batch, dtype):
    t = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    return max(t, 128) if batch >= 128 else t


@lru_cache(maxsize=256)
def _build_dct2(n: int, batch: int, dtype_str: str, interpret: bool,
                mode: str):
    dtype = jnp.dtype(dtype_str)
    m, f, consts = _fft_consts(n, -1, dtype)
    k = np.arange(n, dtype=np.int64)
    w = _cis(k, 2 * n, -1)                   # e^{-i pi k/(2n)}
    consts = consts + [np.asarray(w[0], dtype).reshape(1, n),
                       np.asarray(w[1], dtype).reshape(1, n)]
    ne = (n + 1) // 2
    tile = _tile(n, batch, dtype)
    grid = (pl.cdiv(batch, tile),)
    se = pl.BlockSpec((tile, ne), lambda i: (i, 0), memory_space=pltpu.VMEM)
    so = pl.BlockSpec((tile, n - ne), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    sn = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct2_kernel, m, f, tile, mode, ne),
        out_shape=jax.ShapeDtypeStruct((batch, n), dtype),
        grid=grid,
        in_specs=[se, so] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(7 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(2 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda xe, xor: call(xe, xor, *consts)


@lru_cache(maxsize=256)
def _build_dct3(n: int, batch: int, dtype_str: str, interpret: bool,
                mode: str):
    dtype = jnp.dtype(dtype_str)
    m0, f0 = _twostep_split(n)
    tp = np.arange(m0, dtype=np.int64)
    a = _cis(tp, 2 * m0, -1)                 # e^{-i pi t'/(2m)}  (t' f/(2n))
    j = np.arange(f0, dtype=np.int64)
    b = _cis(j, 2 * n, -1)                   # e^{-i pi j/(2n)}
    m, f, consts = _fft_consts(n, -1, dtype, pre_a=a, pre_b=b)
    h0 = np.ones((1, n), dtype)
    h0[0, 0] = 0.5
    consts = consts + [h0]
    tile = _tile(n, batch, dtype)
    grid = (pl.cdiv(batch, tile),)
    sn = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sh = pl.BlockSpec((tile, n // 2), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct3_kernel, m, f, tile, mode),
        out_shape=(jax.ShapeDtypeStruct((batch, n // 2), dtype),
                   jax.ShapeDtypeStruct((batch, n // 2), dtype)),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=(sh, sh),
        cost_estimate=pl.CostEstimate(
            flops=int(6 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(2 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


def dct2_pallas(x):
    """(B, n) real -> DCT-II (rustdct convention) via the fused kernel.
    Caller guarantees dct_pallas_supported(n, x.dtype)."""
    batch, n = x.shape
    xe = x[:, 0::2]
    xor = x[:, 1::2][:, ::-1]
    run = _build_dct2(n, batch, str(x.dtype),
                      bool(config.pallas_interpret), dot_mode())
    return run(xe, xor)


def dct3_pallas(x):
    """(B, n) real -> DCT-III (rustdct convention) via the fused kernel."""
    batch, n = x.shape
    run = _build_dct3(n, batch, str(x.dtype),
                      bool(config.pallas_interpret), dot_mode())
    ev, od = run(x)
    # unperm: z[2t] = head[t], z[2t+1] = flip(tail)[t]  (XLA interleave)
    z = jnp.stack([ev, od[:, ::-1]], axis=-1).reshape(batch, n)
    return z
