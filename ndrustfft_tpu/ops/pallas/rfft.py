"""Fused Pallas kernels for R2C forward / C2R inverse (even n) — Mosaic-legal.

The realfft capability (SURVEY.md §2.2 N2) as single kernels: the half-size
complex FFT AND the split/merge (un)packing run in VMEM, so the spectrum
never round-trips HBM between the FFT and the (un)pack as it does in the
XLA lowering.

Round 1's formulation used lane-dim flips and a stack+reshape interleave,
both rejected by Mosaic on real TPU (NOTES_TPU.md), so the kernels were
interpreter-only. This rewrite eliminates every illegal op via an FFT
identity: the spectrum mirror is itself an FFT of the conjugated input,

    Z[(h - k) mod h] = FFT_{+s}(z)[k]          (s = transform sign)
    =>  conj(Z[(h-k) mod h]) = FFT_{s}(conj(z))[k],

so both mirror-dependent passes become ONE batched lane-last FFT over a
2T-row block (rows [z; conj(z)]), followed by elementwise combines, static
slices, and concats — all Mosaic-legal. Derivations:

  forward (pack):   z = xe + i xo;  Z = FFT_h(z);  C = FFT_h(conj z)
                    Fe[k] = (Z[k] + C[k])/2
                    Fo[k] = -i/2 (Z[k] - C[k])
                    X[k]  = Fe[k] + W_n^k Fo[k],    k = 0..h-1
                    X[h]  = Re Z[0] - Im Z[0]       (u[h] = -1)
  inverse (unpack): G[k] = a[k] S[k] + b[k] conj(S[h-k]),
                        a = (1 + i u)/2, b = (1 - i u)/2, u[k] = W_n^{-k}
                    z[t] = IFFTu_h(G)[t]
                         = IFFTu_h(P)[t] + conj(IFFTu_h(conj Q))[t]
                    with P[k] = a[k] S[k],
                         Q[j] = b[(h-j) % h] conj(S[j]) for j >= 1,
                         Q[0] = b[0] conj(S[h])      (Nyquist, w^{-th} = 1)
                    x[2t] = 2 Re z[t], x[2t+1] = 2 Im z[t]

The b-vector reversal happens host-side in numpy at plan-build time (a
constant), never inside the kernel. The kernel emits even/odd samples as
two output refs; XLA interleaves them (a fused relayout) — the
stack+reshape interleave is not Mosaic-representable.

Odd n keeps the XLA engine path (full-length C2C on complexified input).
Reference semantics (normalization-first, DC/Nyquist imag zeroing,
src/lib.rs:506-523) are applied by the caller before c2r, as in the engine.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from ...plan import R2CPlan, _cis, get_c2c_plan
from .fft import (
    _VMEM_LIMIT,
    _flat_consts,
    _lane_last_math,
    _lane_tile,
    _plan_consts,
    _twostep_consts,
    _twostep_math,
    _twostep_split,
    _unflat,
    dot_mode,
    pallas_supported,
)


def rfft_pallas_supported(plan: R2CPlan, dtype) -> bool:
    if not plan.half:
        return False
    return pallas_supported(plan.sub, dtype)


def _half_fft_consts(h: int, sign: int, dtype, mode: str):
    """Kernel-schedule constants for the length-h lane-last FFT.

    Prefers the twostep body (all 2-D matmuls — measured 1.5-2x faster than
    the recursive leading-dot form); falls back to the generic lane-last
    schedule for h without a {128,256} split."""
    ts = _twostep_split(h)
    if h > 256 and ts is not None and ts[0] <= config.max_base_radix:
        consts, (m, f) = _twostep_consts(h, sign, dtype, mode)
        return consts, ("ts", m, f)
    f, m, mid, lane, tw = _plan_consts(h, sign, dtype)
    consts, struct, has_base, has_tw = _flat_consts(mid, lane, tw)
    return consts, ("gen", struct, has_base, has_tw, m, f)


def _half_fft(wr, wi, const_vals, meta, mode):
    """Run the length-h FFT on a (rows, h) complex pair inside a kernel."""
    if meta[0] == "ts":
        _, m, f = meta
        return _twostep_math(wr, wi, const_vals, m, f, wr.shape[0], mode)
    _, struct, has_base, has_tw, m, f = meta
    stages, base, lane, tw = _unflat(const_vals, struct, has_base, has_tw)
    return _lane_last_math(wr, wi, stages, base, lane, tw, m, f, mode)


def _r2c_kernel(fft_meta, mode, h, xe_ref, xo_ref, *refs):
    n_fft_consts = len(refs) - 4  # trailing: u_r, u_i, or_ref, oi_ref
    const_vals = [r[:] for r in refs[:n_fft_consts]]
    ur = refs[n_fft_consts][:]      # (1, h) forward unpack twiddle, k < h
    ui = refs[n_fft_consts + 1][:]
    or_ref, oi_ref = refs[-2:]
    xe, xo = xe_ref[:], xo_ref[:]
    # rows [z; conj(z)] through one FFT_h: top half -> Z, bottom -> C
    t = xe.shape[0]
    wr = jnp.concatenate([xe, xe], axis=0)
    wi = jnp.concatenate([xo, -xo], axis=0)
    yr, yi = _half_fft(wr, wi, const_vals, fft_meta, mode)
    zr, zi = yr[:t], yi[:t]
    cr, ci = yr[t:], yi[t:]
    fer = 0.5 * (zr + cr)
    fei = 0.5 * (zi + ci)
    for_ = 0.5 * (zi - ci)          # Re(-i/2 (Z - C))
    foi = -0.5 * (zr - cr)          # Im(-i/2 (Z - C))
    xr = fer + for_ * ur - foi * ui
    xi = fei + for_ * ui + foi * ur
    # bin k = h (Nyquist): X[h] = Re Z[0] - Im Z[0], imag 0
    last = zr[:, :1] - zi[:, :1]
    or_ref[:] = jnp.concatenate([xr, last], axis=-1)
    oi_ref[:] = jnp.concatenate([xi, jnp.zeros_like(last)], axis=-1)


def _c2r_kernel(fft_meta, mode, h, sr_ref, si_ref, *refs):
    n_fft_consts = len(refs) - 7  # trailing: a_r,a_i,c_r,c_i,b0(1,2), outs x2
    const_vals = [r[:] for r in refs[:n_fft_consts]]
    ar = refs[n_fft_consts][:]      # (1, h)
    ai = refs[n_fft_consts + 1][:]
    cr_ = refs[n_fft_consts + 2][:]  # (1, h): c[j] = b[(h-j)%h], c[0] = 0
    ci_ = refs[n_fft_consts + 3][:]
    b0 = refs[n_fft_consts + 4][:]  # (1, 2): Re b[0], Im b[0]
    or_ref, oi_ref = refs[-2:]
    sr, si = sr_ref[:], si_ref[:]   # (T, m), m = h + 1
    skr, ski = sr[:, :h], si[:, :h]
    # P = a * S
    pr = ar * skr - ai * ski
    pi = ar * ski + ai * skr
    # Q = c * conj(S); then Q[0] += b0 * conj(S[h])  (Nyquist fold)
    qr = cr_ * skr + ci_ * ski
    qi = ci_ * skr - cr_ * ski
    snr, sni = sr[:, h:], si[:, h:]                     # (T, 1)
    q0r = qr[:, :1] + b0[:, :1] * snr + b0[:, 1:] * sni
    q0i = qi[:, :1] + b0[:, 1:] * snr - b0[:, :1] * sni
    qr = jnp.concatenate([q0r, qr[:, 1:]], axis=-1)
    qi = jnp.concatenate([q0i, qi[:, 1:]], axis=-1)
    # rows [P; conj(Q)] through one IFFTu_h (sign +1 plan baked in consts)
    t = sr.shape[0]
    wr = jnp.concatenate([pr, qr], axis=0)
    wi = jnp.concatenate([pi, -qi], axis=0)
    yr, yi = _half_fft(wr, wi, const_vals, fft_meta, mode)
    # z = IFFTu(P) + conj(IFFTu(conj Q));  x[2t] = 2 Re z, x[2t+1] = 2 Im z
    or_ref[:] = 2.0 * (yr[:t] + yr[t:])
    oi_ref[:] = 2.0 * (yi[:t] - yi[t:])


@lru_cache(maxsize=256)
def _build_r2c(n: int, batch: int, dtype_str: str, interpret: bool,
               mode: str):
    """(B, h) even/odd real pair -> (B, m) split re/im spectrum."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    consts, fft_meta = _half_fft_consts(h, -1, dtype, mode)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)     # W_n^k, k = 0..h-1
    consts = consts + [np.asarray(ur, dtype).reshape(1, h),
                       np.asarray(ui, dtype).reshape(1, h)]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, h), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_kernel, fft_meta, mode, h),
        out_shape=(jax.ShapeDtypeStruct((batch, m), dtype),
                   jax.ShapeDtypeStruct((batch, m), dtype)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(4 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda xe, xo: call(xe, xo, *consts)


@lru_cache(maxsize=256)
def _build_c2r(n: int, batch: int, dtype_str: str, interpret: bool,
               mode: str):
    """(B, m) split re/im (pre-normalized, DC/Nyquist-masked) ->
    ((B, h) even, (B, h) odd) real sample streams."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    consts, fft_meta = _half_fft_consts(h, +1, dtype, mode)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, +1)     # W_n^{-k} under the forward convention
    a_r, a_i = 0.5 * (1.0 - ui), 0.5 * ur          # (1 + i u)/2
    b_r, b_i = 0.5 * (1.0 + ui), -0.5 * ur         # (1 - i u)/2
    # c[j] = b[(h - j) % h] with c[0] zeroed (j=0 term comes from Nyquist)
    idx = (-k) % h
    c_r, c_i = b_r[idx].copy(), b_i[idx].copy()
    c_r[0] = 0.0
    c_i[0] = 0.0
    consts = consts + [
        np.asarray(a_r, dtype).reshape(1, h),
        np.asarray(a_i, dtype).reshape(1, h),
        np.asarray(c_r, dtype).reshape(1, h),
        np.asarray(c_i, dtype).reshape(1, h),
        np.asarray([b_r[0], b_i[0]], dtype).reshape(1, 2),
    ]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, h), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_c2r_kernel, fft_meta, mode, h),
        out_shape=(jax.ShapeDtypeStruct((batch, h), dtype),
                   jax.ShapeDtypeStruct((batch, h), dtype)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(4 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda sr, si: call(sr, si, *consts)


def r2c_pallas(xe, xo, plan: R2CPlan):
    """(B, h) even/odd real streams -> (B, m) split re/im via the fused
    kernel (caller extracts xe = x[..., 0::2], xo = x[..., 1::2])."""
    batch, _h = xe.shape
    run = _build_r2c(plan.n, batch, str(xe.dtype),
                     bool(config.pallas_interpret), dot_mode())
    return run(xe, xo)


def c2r_pallas(sr, si, n: int):
    """(B, m) split re/im (pre-normalized, DC/Nyquist-masked) ->
    ((B, h) even, (B, h) odd); the caller interleaves in XLA."""
    batch = sr.shape[0]
    run = _build_c2r(n, batch, str(sr.dtype),
                     bool(config.pallas_interpret), dot_mode())
    return run(sr, si)
