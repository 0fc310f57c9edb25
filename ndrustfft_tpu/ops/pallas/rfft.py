"""Fused Pallas kernels for R2C forward / C2R inverse (even n).

The realfft capability (SURVEY.md §2.2 N2) as single kernels: the half-size
complex FFT AND the split/merge (un)packing run in VMEM, so a real transform
costs one HBM read of n reals and one write of m complexes — no intermediate
round trips. Derivations:

  forward (pack):   z[t] = x[2t] + i x[2t+1];  Z = FFT_h(z)
                    Fe[k] = (Z[k] + conj(Z[h-k]))/2
                    Fo[k] = -i/2 (Z[k] - conj(Z[h-k]))
                    X[k]  = Fe[k] + W_n^k Fo[k],          k = 0..h (m bins)
  inverse (unpack): Fe[k] = (S[k] + conj(S[h-k]))/2
                    Fo[k] = W_n^{-k} (S[k] - conj(S[h-k]))/2
                    z     = 2 * IFFTu_h(Fe + i Fo)        (IFFTu unnormalized)
                    x[2t] = Re z[t], x[2t+1] = Im z[t]

Odd n keeps the XLA engine path (full-length C2C on complexified input).
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
from ..engine import ct_valued
from .fft import _lane_tile, pallas_supported


def rfft_pallas_supported(plan: R2CPlan, dtype) -> bool:
    # These fused kernels use lane-dim splits/flips that Mosaic rejects;
    # they run in INTERPRETER mode only (validating the fused math). On real
    # TPU the R2C path packs/unpacks in XLA around the Mosaic C2C kernel.
    if not config.pallas_interpret:
        return False
    if not plan.half:
        return False
    return pallas_supported(plan.sub, dtype)


def _flatten_consts(plan, dtype):
    """Stage constants of a generic ct plan as numpy arrays + structure."""
    consts, struct = [], []
    for f, m, wf, tw in plan.stages:
        consts += [np.asarray(wf[0], dtype), np.asarray(wf[1], dtype),
                   np.asarray(tw[0], dtype), np.asarray(tw[1], dtype)]
        struct.append((f, m))
    consts += [np.asarray(plan.base[0], dtype), np.asarray(plan.base[1], dtype)]
    return consts, tuple(struct)


def _stages_from_refs(struct, const_refs):
    stages = []
    i = 0
    for f, m in struct:
        stages.append((f, m, (const_refs[i][:], const_refs[i + 1][:]),
                       (const_refs[i + 2][:], const_refs[i + 3][:])))
        i += 4
    base = (const_refs[i][:], const_refs[i + 1][:])
    return stages, base, i + 2


def _r2c_kernel(struct, n, x_ref, *refs):
    h = n // 2
    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages, base, used = _stages_from_refs(struct, const_refs)
    twr = const_refs[used][:]      # (1, m) forward unpack twiddle
    twi = const_refs[used + 1][:]
    xv = x_ref[:]                                        # (T, n)
    tile = xv.shape[0]
    xe = xv.reshape(tile, h, 2)[:, :, 0]
    xo = xv.reshape(tile, h, 2)[:, :, 1]
    zr, zi = ct_valued(xe, xo, stages, base)             # FFT_h(xe + i xo)
    zkr = jnp.concatenate([zr, zr[:, :1]], axis=-1)      # Z[k], k = 0..h
    zki = jnp.concatenate([zi, zi[:, :1]], axis=-1)
    zmr = jnp.concatenate([zr[:, :1], zr[:, 1:][:, ::-1], zr[:, :1]], axis=-1)
    zmi = jnp.concatenate([zi[:, :1], zi[:, 1:][:, ::-1], zi[:, :1]], axis=-1)
    fer = 0.5 * (zkr + zmr)
    fei = 0.5 * (zki - zmi)
    for_ = 0.5 * (zki + zmi)
    foi = -0.5 * (zkr - zmr)
    or_ref[:] = fer + for_ * twr - foi * twi
    oi_ref[:] = fei + for_ * twi + foi * twr


def _c2r_kernel(struct, n, sr_ref, si_ref, *refs):
    h = n // 2
    const_refs = refs[:-1]
    out_ref = refs[-1]
    stages, base, used = _stages_from_refs(struct, const_refs)
    twr = const_refs[used][:]      # (1, h) inverse twiddle W_n^{-k}, k < h
    twi = const_refs[used + 1][:]
    sr = sr_ref[:]                                       # (T, m)
    si = si_ref[:]
    tile = sr.shape[0]
    # mirror S[h-k] for k = 0..h-1 : [S[h], S[h-1], .., S[1]]
    smr = sr[:, 1:][:, ::-1]
    smi = si[:, 1:][:, ::-1]
    skr = sr[:, :h]
    ski = si[:, :h]
    fer = 0.5 * (skr + smr)
    fei = 0.5 * (ski - smi)
    dr = 0.5 * (skr - smr)
    di = 0.5 * (ski + smi)
    forr = dr * twr - di * twi
    foi = dr * twi + di * twr
    zr = fer - foi
    zi = fei + forr
    yr, yi = ct_valued(zr, zi, stages, base)             # IFFTu_h
    z = jnp.stack([2.0 * yr, 2.0 * yi], axis=-1).reshape(tile, n)
    out_ref[:] = z


@lru_cache(maxsize=256)
def _build_r2c(n: int, batch: int, dtype_str: str, interpret: bool):
    h = n // 2
    m = h + 1
    plan = get_c2c_plan(h, -1)
    dtype = jnp.dtype(dtype_str)
    consts, struct = _flatten_consts(plan, dtype)
    k = np.arange(m, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)
    consts += [np.asarray(ur, dtype).reshape(1, m),
               np.asarray(ui, dtype).reshape(1, m)]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_kernel, struct, n),
        out_shape=(jax.ShapeDtypeStruct((batch, m), dtype),
                   jax.ShapeDtypeStruct((batch, m), dtype)),
        grid=grid,
        in_specs=[in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


@lru_cache(maxsize=256)
def _build_c2r(n: int, batch: int, dtype_str: str, interpret: bool):
    h = n // 2
    m = h + 1
    plan = get_c2c_plan(h, +1)
    dtype = jnp.dtype(dtype_str)
    consts, struct = _flatten_consts(plan, dtype)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, +1)  # W_n^{-k} for the forward-sign convention
    consts += [np.asarray(ur, dtype).reshape(1, h),
               np.asarray(ui, dtype).reshape(1, h)]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_c2r_kernel, struct, n),
        out_shape=jax.ShapeDtypeStruct((batch, n), dtype),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        interpret=interpret,
    )
    return lambda sr, si: call(sr, si, *consts)


def r2c_pallas(x, plan: R2CPlan):
    """(B, n) real -> (B, m) split re/im via the fused kernel."""
    batch, n = x.shape
    run = _build_r2c(n, batch, str(x.dtype), bool(config.pallas_interpret))
    return run(x)


def c2r_pallas(sr, si, n: int):
    """(B, m) split re/im (pre-normalized, DC/Nyquist-masked) -> (B, n) real."""
    batch = sr.shape[0]
    run = _build_c2r(n, batch, str(sr.dtype), bool(config.pallas_interpret))
    return run(sr, si)
