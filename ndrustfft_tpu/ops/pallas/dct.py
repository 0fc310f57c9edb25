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

Round-2 fusions:

* DCT-II is NATURAL-LAYOUT: the kernel consumes whole (T, n) rows. The
  Makhoul permutation v = [x_even; reversed(x_odd)] — whose flip is not
  Mosaic-representable (lax.rev) and previously ran as an external XLA
  strided-slice pass — folds into constants and legal ops: the entry
  transpose de-interleaves even/odd (reshape (h,2,T) + middle slices), the
  tail's t'-reversal folds into the stage-1 matrix rows (build-time), and
  its j-reversal is an aligned lane-chunk permutation (static slices +
  concat). Derivation: v[t'f+j] for t' >= m/2 equals
  x_odd[(m/2-1-s)f + (f-1-j)] with s = t'-m/2, so
  sum_{t'} Wm[t',p] v[t'f+j] = Wm[:m/2]^T x_even  +  (Wm[m/2:][::-1])^T
  (x_odd with j-chunks reversed).
* The handler's scalar normalization (Default = x2, applied BEFORE the
  transform per the reference, src/lib.rs:688-741) rides the stage-twiddle
  constants — zero extra passes.
* bf16x3 K-stacked dot matrices are prebuilt host-side (fft.ks_w3_np /
  ks_w6_np / ks_w6_re_np); DCT-III's combine computes only the real output
  rows (half the stage-2 MXU work).

DCT-III's output un-permutation (z[2t] = head[t], z[2t+1] = flip(tail)[t])
still runs in XLA at the boundary: its flip spans output rows in a way that
folds into neither constants nor legal lane ops.

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
from ...config import use_pallas_effective as _use_pallas
from ...plan import _cis, dft_matrix, stage_twiddle
from .fft import (
    _MAX_N,
    _VMEM_LIMIT,
    _ks_complex_dot,
    _ks_real_dot,
    _lane_tile,
    _twostep_split,
    dot_mode,
    lane_tile_for,
    ks_w3_np,
    ks_w6_np,
    ks_w6_re_np,
)


def _dct_msplit(n: int) -> int:
    """Effective stage-split preference for the fused DCT kernels.

    ``config.dct_split`` > 0 forces that m (when it divides n — otherwise
    :func:`fft._twostep_split` silently falls back to auto); 0 = the
    measured per-n default. The DCT kernels' MXU cost is their stage-1
    dense DFT-m dot (6 m^2 f L MACs/tile, linear in m), so smaller legal
    m is faster whenever the f-butterfly stays on the VPU — but only an
    on-chip A/B can bless a per-n entry here (round-5 probe)."""
    forced = int(config.dct_split)
    if forced:
        return forced
    return _DCT_MSPLIT_DEFAULT.get(n, 0)


# per-n measured winners (on-chip A/B, tools/split_probe.py); empty until
# a round's probe blesses an entry
_DCT_MSPLIT_DEFAULT = {}


def dct_pallas_supported(n: int, dtype) -> bool:
    if not _use_pallas():
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


def _fft_consts(n: int, sign: int, dtype, mode: str, scale: float = 1.0,
                pre_a=None, pre_b=None, row_perm=None, re_only_s2=False,
                m_pref: int = 0):
    """Mode-packed twostep consts for a REAL-input length-n FFT.

    bf16x3: [W3m (3m, 2m) bf16, tw_r (m,f), tw_i, W6f bf16]; other modes:
    [wm_r, wm_i, tw_r, tw_i, wf_r, wf_i] f32. Folds: ``pre_a[t']`` into the
    Wm rows (complex), ``pre_b[j]`` and ``scale`` into the stage twiddle,
    ``row_perm`` permutes Wm's rows (the Makhoul fold), ``re_only_s2``
    builds the real-rows-only stage-2 matrix. ``m_pref`` forces the
    (m, f) split (config.dct_split; the stage-1 dot is 6 m^2 f L MACs per
    tile, so m=64 halves the kernel's MXU work vs m=128 when it divides)."""
    m, f = _twostep_split(n, m_pref)
    wm_r, wm_i = dft_matrix(m, sign)
    if pre_a is not None:
        ar, ai = pre_a  # (m,)
        wm_r, wm_i = (wm_r * ar[:, None] - wm_i * ai[:, None],
                      wm_r * ai[:, None] + wm_i * ar[:, None])
    if row_perm is not None:
        wm_r, wm_i = wm_r[row_perm], wm_i[row_perm]
    tw = stage_twiddle(f, m, sign)          # (f, m)[j, p]
    tw_r, tw_i = tw[0].T.copy() * scale, tw[1].T.copy() * scale  # (m, f)
    if pre_b is not None:
        br, bi = pre_b  # (f,)
        tw_r, tw_i = (tw_r * br[None, :] - tw_i * bi[None, :],
                      tw_r * bi[None, :] + tw_i * br[None, :])
    wf = dft_matrix(f, sign)
    if mode == "bf16x3":
        w3m = ks_w3_np(np.concatenate([wm_r, wm_i], axis=1))
        w6f = (ks_w6_re_np(wf[0], wf[1]) if re_only_s2
               else ks_w6_np(wf[0], wf[1]))
        consts = [w3m, np.asarray(tw_r, dtype), np.asarray(tw_i, dtype), w6f]
    else:
        consts = [np.asarray(c, dtype) for c in
                  (wm_r, wm_i, tw_r, tw_i, wf[0], wf[1])]
    return m, f, consts


def _real_ts_core_x2(x2, consts, m, f, cols, mode, re_only, sign=-1):
    """Twostep FFT core on a pre-assembled REAL x2 (m, f*cols); returns
    n-LEADING (n, cols) (zr, zi), zi None when ``re_only``.

    Stage 1 runs in the SWAPPED orientation (out (f*cols, 2p) =
    dot_general(x3, w3)) so its output is already (j, l)-leading and the
    mid lane<->sublane transpose disappears (see fft._ts_core_nlead)."""
    from .fft import _bf16_split, _dg_sw

    n = m * f
    if mode == "bf16x3":
        w3m, tws_r, tws_i, w6f = consts
        xh, xl = _bf16_split(x2)
        x3 = jnp.concatenate([xh, xl, xh], axis=0)
        ab = jax.lax.dot_general(x3, w3m, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = lambda ar, ai: _ks_complex_dot(  # noqa: E731
            ar, ai, None, None, mode, w6=w6f, re_only=re_only)
    else:
        (wm_r, wm_i, tws_r, tws_i, wf_r, wf_i) = consts
        ab = jnp.concatenate([_dg_sw(x2, wm_r, mode),
                              _dg_sw(x2, wm_i, mode)], axis=-1)
        s2 = lambda ar, ai: _ks_complex_dot(  # noqa: E731
            ar, ai, wf_r, wf_i, mode, re_only=re_only)
    y3 = ab.reshape(f, cols, 2 * m)                  # (j, l, [re p | im p])
    yr, yi = y3[:, :, :m], y3[:, :, m:]
    twr = tws_r.T.reshape(f, 1, m)                   # tiny (m, f) const flip
    twi = tws_i.T.reshape(f, 1, m)
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
    from .fft import _BFLY_F, bfly_dft_leading

    if f in _BFLY_F:
        planes = bfly_dft_leading([(yr[k], yi[k]) for k in range(f)], sign)
        zr = jnp.concatenate([p[0][None] for p in planes], axis=0)
        zi = (None if re_only else
              jnp.concatenate([p[1][None] for p in planes], axis=0))
    else:
        zr, zi = s2(yr, yi)                          # (q, cols, m)
    zr = jnp.swapaxes(zr, 1, 2).reshape(n, cols)
    if zi is None:
        return zr, None
    return zr, jnp.swapaxes(zi, 1, 2).reshape(n, cols)


def _dct2_kernel(m, f, mode, h, x_ref, *refs):
    """Natural-layout DCT-II: block (T, n) real -> (T, n) real."""
    consts = [r[:] for r in refs[:-3]]
    w_r = refs[-3][:]               # (n, 1) post twiddle, k-ordered
    w_i = refs[-2][:]
    out_ref = refs[-1]
    t = x_ref.shape[0]
    xt = x_ref[:].T.reshape(h, 2, t)             # de-interleave even/odd
    xe = xt[:, 0, :].reshape(m // 2, f * t)
    xo3 = xt[:, 1, :].reshape(m // 2, f, t)
    # the Makhoul tail's j-reversal: aligned lane-chunk permutation
    xo2 = jnp.concatenate([xo3[:, jj, :] for jj in range(f - 1, -1, -1)],
                          axis=1)                # (m/2, f*t)
    x2 = jnp.concatenate([xe, xo2], axis=0)      # == v.T.reshape(m, f*t)
    zr, zi = _real_ts_core_x2(x2, consts, m, f, t, mode, re_only=False)
    out_ref[:] = (zr * w_r - zi * w_i).T         # (T, n)


def _dct3_kernel(m, f, mode, x_ref, *refs):
    consts = [r[:] for r in refs[:-3]]
    h0 = refs[-3][:]                # (n, 1) x0-halving mask (column)
    ev_ref, od_ref = refs[-2:]
    t = x_ref.shape[0]
    c = x_ref[:].T * h0                          # (n, T)
    n = m * f
    zr, _ = _real_ts_core_x2(c.reshape(m, f * t), consts, m, f, t, mode,
                             re_only=True)
    half = n // 2
    ev_ref[:] = zr[:half, :].T
    od_ref[:] = zr[half:, :].T


def _tile(n, batch, dtype):
    t = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    return max(t, 128) if batch >= 128 else t


@lru_cache(maxsize=256)
def _build_dct2(n: int, batch: int, dtype_str: str, interpret: bool,
                mode: str, scale: float = 1.0):
    dtype = jnp.dtype(dtype_str)
    m0, _f0 = _twostep_split(n)
    # Makhoul fold: W'' rows = [Wm[:m/2]; Wm[m/2:][::-1]] (see module doc)
    perm = np.concatenate([np.arange(m0 // 2),
                           np.arange(m0 - 1, m0 // 2 - 1, -1)])
    m, f, consts = _fft_consts(n, -1, dtype, mode, scale=scale,
                               row_perm=perm)
    k = np.arange(n, dtype=np.int64)
    w = _cis(k, 2 * n, -1)                   # e^{-i pi k/(2n)}
    consts = consts + [np.asarray(w[0], dtype).reshape(n, 1),
                       np.asarray(w[1], dtype).reshape(n, 1)]
    h = n // 2
    tile = _tile(n, batch, dtype)
    grid = (pl.cdiv(batch, tile),)
    sn = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct2_kernel, m, f, mode, h),
        out_shape=jax.ShapeDtypeStruct((batch, n), dtype),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(7 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(2 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


@lru_cache(maxsize=256)
def _build_dct3(n: int, batch: int, dtype_str: str, interpret: bool,
                mode: str, scale: float = 1.0):
    dtype = jnp.dtype(dtype_str)
    m0, f0 = _twostep_split(n)
    tp = np.arange(m0, dtype=np.int64)
    a = _cis(tp, 2 * m0, -1)                 # e^{-i pi t'/(2m)}  (t' f/(2n))
    j = np.arange(f0, dtype=np.int64)
    b = _cis(j, 2 * n, -1)                   # e^{-i pi j/(2n)}
    m, f, consts = _fft_consts(n, -1, dtype, mode, scale=scale,
                               pre_a=a, pre_b=b, re_only_s2=True)
    h0 = np.ones((n, 1), dtype)
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
        partial(_dct3_kernel, m, f, mode),
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


def dct2_pallas(x, scale=None):
    """(B, n) real -> scale * DCT-II (rustdct convention) via the fused
    natural-layout kernel (the Makhoul permutation and the normalization
    scalar are folded into the constants). Caller guarantees
    dct_pallas_supported(n, x.dtype)."""
    batch, n = x.shape
    run = _build_dct2(n, batch, str(x.dtype),
                      bool(config.pallas_interpret), dot_mode(),
                      float(1.0 if scale is None else scale))
    return run(x)


def dct3_pallas(x, scale=None):
    """(B, n) real -> scale * DCT-III (rustdct convention) via the fused
    kernel; the normalization scalar rides the stage constants."""
    batch, n = x.shape
    run = _build_dct3(n, batch, str(x.dtype),
                      bool(config.pallas_interpret), dot_mode(),
                      float(1.0 if scale is None else scale))
    ev, od = run(x)
    # unperm: z[2t] = head[t], z[2t+1] = flip(tail)[t]  (XLA interleave)
    z = jnp.stack([ev, od[:, ::-1]], axis=-1).reshape(batch, n)
    return z


# --------------------------------------------------------------------------
# axis-mid variants: transform along the MIDDLE axis of (B, n, L) blocks —
# no entry/exit transposes at all (the even/odd structure is a free
# middle-dim reshape) and no API moveaxis passes.
# --------------------------------------------------------------------------


def _dct2_kernel_mid(m, f, mode, h, x_ref, *refs):
    """Block (1, n, TL) real -> (1, n, TL): natural DCT-II, mid-axis."""
    consts = [r[:] for r in refs[:-3]]
    w_r = refs[-3][:]               # (n, 1) post twiddle
    w_i = refs[-2][:]
    out_ref = refs[-1]
    tl = x_ref.shape[-1]
    n = m * f
    xt = x_ref[:].reshape(h, 2, tl)              # free even/odd split
    xe = xt[:, 0, :].reshape(m // 2, f * tl)
    xo3 = xt[:, 1, :].reshape(m // 2, f, tl)
    xo2 = jnp.concatenate([xo3[:, jj, :] for jj in range(f - 1, -1, -1)],
                          axis=1)                # Makhoul j-reversal
    x2 = jnp.concatenate([xe, xo2], axis=0)
    zr, zi = _real_ts_core_x2(x2, consts, m, f, tl, mode, re_only=False)
    out_ref[:] = (zr * w_r - zi * w_i).reshape(1, n, tl)


def _dct3_kernel_mid(m, f, mode, nc, x_ref, *refs):
    """Block (1, n, TL) real -> (1, n, TL): natural DCT-III INCLUDING the
    output un-permutation. z[2t] = zr[t] and z[2t+1] = zr[n-1-t]; the
    reversed-index read is a second re-only pipeline via the sign-+1
    identity F(y)[n-1-t] = F_{+1}(y * e^{2i pi s/n})[t] (the extra chirp
    is separable and folds into pre_a/pre_b), so the interleave is an
    in-kernel concat and NO XLA epilogue exists (round 4; previously a
    flip+stack pass per call)."""
    cs1 = [r[:] for r in refs[0:nc]]
    cs2 = [r[:] for r in refs[nc:2 * nc]]
    h0 = refs[2 * nc][:]            # (n, 1) x0-halving mask
    out_ref = refs[-1]
    tl = x_ref.shape[-1]
    n = m * f
    c = x_ref[:].reshape(n, tl) * h0
    x2 = c.reshape(m, f * tl)
    zr1, _ = _real_ts_core_x2(x2, cs1, m, f, tl, mode, re_only=True)
    zr2, _ = _real_ts_core_x2(x2, cs2, m, f, tl, mode, re_only=True,
                              sign=+1)
    half = n // 2
    out = jnp.concatenate([zr1[:half].reshape(half, 1, tl),
                           zr2[:half].reshape(half, 1, tl)], axis=1)
    out_ref[:] = out.reshape(1, n, tl)


def _mid_tile(cols: int, tcfg: int = 0) -> int:
    """Shared lane-tile policy (fft.lane_tile_for) at the DCT builders'
    measured 256 cap; tcfg (config.pallas_tile) snaps to a legal width."""
    return lane_tile_for(cols, tcfg, 256)


@lru_cache(maxsize=256)
def _build_dct2_mid(n: int, nb: int, cols: int, dtype_str: str,
                    interpret: bool, mode: str, scale: float = 1.0,
                    tcfg: int = 0, donate: bool = False, msplit: int = 0):
    from .fft import _donate_kw

    dtype = jnp.dtype(dtype_str)
    m0, _f0 = _twostep_split(n, msplit)
    perm = np.concatenate([np.arange(m0 // 2),
                           np.arange(m0 - 1, m0 // 2 - 1, -1)])
    m, f, consts = _fft_consts(n, -1, dtype, mode, scale=scale,
                               row_perm=perm, m_pref=msplit)
    k = np.arange(n, dtype=np.int64)
    w = _cis(k, 2 * n, -1)
    consts = consts + [np.asarray(w[0], dtype).reshape(n, 1),
                       np.asarray(w[1], dtype).reshape(n, 1)]
    h = n // 2
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    sn = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                      memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct2_kernel_mid, m, f, mode, h),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(7 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x: call(x, *consts)


@lru_cache(maxsize=256)
def _build_dct3_mid(n: int, nb: int, cols: int, dtype_str: str,
                    interpret: bool, mode: str, scale: float = 1.0,
                    tcfg: int = 0, donate: bool = False, msplit: int = 0):
    from .fft import _donate_kw

    dtype = jnp.dtype(dtype_str)
    m0, f0 = _twostep_split(n, msplit)
    tp = np.arange(m0, dtype=np.int64)
    a = _cis(tp, 2 * m0, -1)
    j = np.arange(f0, dtype=np.int64)
    b = _cis(j, 2 * n, -1)
    m, f, cons1 = _fft_consts(n, -1, dtype, mode, scale=scale,
                              pre_a=a, pre_b=b, re_only_s2=True,
                              m_pref=msplit)
    # pipeline 2 (odd outputs, natural order): sign +1 with the extra
    # e^{2i pi s/n} fold: pre * e^{2i pi s/n} = e^{+i pi 3 t' f/(2n)} x
    # e^{+i pi 3 j/(2n)} (exact integer phases via _cis)
    a2 = _cis(3 * tp * f0, 2 * n, +1)
    b2 = _cis(3 * j, 2 * n, +1)
    _, _, cons2 = _fft_consts(n, +1, dtype, mode, scale=scale,
                              pre_a=a2, pre_b=b2, re_only_s2=True,
                              m_pref=msplit)
    h0 = np.ones((n, 1), dtype)
    h0[0, 0] = 0.5
    consts = cons1 + cons2 + [h0]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    sn = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                      memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct3_kernel_mid, m, f, mode, len(cons1)),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(6 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x: call(x, *consts)


def dct2_pallas_mid(x, scale=None):
    """(B, n, L) real -> scale * DCT-II along axis 1 (no moveaxis, no
    transposes)."""
    nb, n, cols = x.shape
    run = _build_dct2_mid(n, nb, cols, str(x.dtype),
                          bool(config.pallas_interpret), dot_mode(),
                          float(1.0 if scale is None else scale),
                          tcfg=int(config.pallas_tile),
                          donate=bool(config.donate_io),
                          msplit=_dct_msplit(n))
    return run(x)


def dct3_pallas_mid(x, scale=None):
    """(B, n, L) real -> scale * DCT-III along axis 1, in ONE kernel pass —
    the output un-permutation (z[2t] = zr[t], z[2t+1] = zr[n-1-t]) runs
    in-kernel via a second sign-+1 re-only pipeline (no XLA epilogue)."""
    nb, n, cols = x.shape
    run = _build_dct3_mid(n, nb, cols, str(x.dtype),
                          bool(config.pallas_interpret), dot_mode(),
                          float(1.0 if scale is None else scale),
                          tcfg=int(config.pallas_tile),
                          donate=bool(config.donate_io),
                          msplit=_dct_msplit(n))
    return run(x)


# --------------------------------------------------------------------------
# dense-matrix DCT kernel (axis-mid): every DCT type has an exact real
# (n, n) matrix, so any moderate n — including ODD sizes (the reference's
# dct2d grid: 129/265/513/1025) and DCT-IV, which have no O(n log n) fused
# kernel here — runs as ONE K-stacked real MXU dot with ZERO relayouts:
# the dot's output rows land directly in the (1, n, TL) block layout.
# O(n^2) MACs beat the XLA odd-n lowering's many HBM passes by ~an order
# of magnitude at these sizes (428 us -> MXU estimate ~40 at n=1025).
# --------------------------------------------------------------------------

_DENSE_DCT_MAX = 1100   # W3 bf16 const = 6n^2 bytes (7.3 MB at the cap)


def _dct_dense_matrix(n: int, dct_type: int):
    """Exact f64 (n, n) DCT matrix M[k, t], rustdct convention
    (== scipy unnormalized / 2); integer-exact angle reduction."""
    t = np.arange(n, dtype=np.int64)
    k = np.arange(n, dtype=np.int64)
    if dct_type == 1:
        m_ = _cis(np.outer(k, t), n - 1, -1)[0]
        m_[:, 0] *= 0.5
        m_[:, n - 1] *= 0.5
    elif dct_type == 2:
        m_ = _cis(np.outer(k, 2 * t + 1), 2 * n, -1)[0]
    elif dct_type == 3:
        m_ = _cis(np.outer(2 * k + 1, t), 2 * n, -1)[0]
        m_[:, 0] = 0.5
    elif dct_type == 4:
        m_ = _cis(np.outer(2 * k + 1, 2 * t + 1), 4 * n, -1)[0]
    else:
        raise ValueError(f"bad dct type {dct_type}")
    return m_


def dct_dense_mid_supported(n: int, dtype) -> bool:
    if not _use_pallas():
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 2 or n > _DENSE_DCT_MAX:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def _dct_dense_kernel(n, mode, x_ref, *refs):
    """(1, n, TL) real -> (1, n, TL): one dense real dot."""
    consts = [r[:] for r in refs[:-1]]
    out_ref = refs[-1]
    tl = x_ref.shape[-1]
    x = x_ref[:].reshape(n, tl)
    if mode == "bf16x3":
        z, _ = _ks_real_dot(x, None, None, mode, im_out=False, w3=consts[0])
    else:
        from .fft import _dg

        z = _dg(consts[0], x, (((0,), (0,)), ((), ())), mode)
    out_ref[:] = z.reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_dct_dense_mid(n: int, dct_type: int, nb: int, cols: int,
                         dtype_str: str, interpret: bool, mode: str,
                         scale: float, tcfg: int = 0, donate: bool = False):
    from .fft import _donate_kw

    dtype = jnp.dtype(dtype_str)
    m_ = _dct_dense_matrix(n, dct_type) * scale
    if mode == "bf16x3":
        consts = [ks_w3_np(m_.T)]        # w[t, k] = M^T
    else:
        consts = [np.asarray(m_.T, dtype)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    sn = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                      memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct_dense_kernel, n, mode),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * n * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x: call(x, *consts)


def dct_dense_pallas_mid(x, dct_type: int, scale=None):
    """(B, n, L) real -> scale * DCT-<type> along axis 1 via the dense
    matrix kernel (odd n / DCT-IV / sizes without a twostep split)."""
    nb, n, cols = x.shape
    run = _build_dct_dense_mid(n, dct_type, nb, cols, str(x.dtype),
                               bool(config.pallas_interpret), dot_mode(),
                               float(1.0 if scale is None else scale),
                               tcfg=int(config.pallas_tile),
                               donate=bool(config.donate_io))
    return run(x)


# --------------------------------------------------------------------------
# Fused DCT-IV kernel (axis-mid), even n beyond the dense cap.
#
# The reference plans type 4 at any n (src/lib.rs:643-646,827-844). The
# half-length complex factorization (hl = n/2):
#
#   c_s = w_s (x[2s] + i x[n-1-2s]),  w_s = e^{-i pi (4s+1)/(4n)}
#   D   = FFT_hl(c),  E_k = D_k e^{-i pi k / n}
#   X[2k] = Re(E_k),  X[n-1-2k] = -Im(E_k)        (rustdct base values)
#
# previously ran as kernel + THREE XLA passes (entry strided deinterleave/
# flip/chirp, exit chirp, interleave) — measured ~300 us of glue per
# 2048^2 transform vs ~50 us of kernel. This kernel fuses everything but
# the final flip+interleave:
#
# * entry deinterleave: reshape (hl, 2, TL) + middle slices (the DCT-II
#   kernel's pattern — no strided HBM access)
# * ALL data movement folds into constants or aligned lane-chunk concats,
#   because the chirps are SEPARABLE over the twostep index split
#   v = t'*f + j (geometric chirps factor over any index split):
#   w_s = C0 * a[t'] * b[j].  Four REAL-input twostep pipelines (reusing
#   _real_ts_core_x2 + _fft_consts' pre_a/pre_b/row_perm folds, the
#   Makhoul DCT-II machinery):
#     E_k = FFT_hl(c)_k            = A(xe) + B(xod_jrev)      [sign -1]
#     G_j = FFT_hl(c)_{hl-1-j}
#         = FFT_{+1}(c * e^{2i pi s/hl})_j = C(xe) + D(xod_jrev) [sign +1]
#   where c = w * (xe + i * rev(xod)): the full-hl reversal of the odd
#   stream becomes (j-chunk concat) + (row-reversed stage-1 matrix), and
#   the sign-+1 identity delivers the ODD outputs X[n-1-2k] = -Im(E_k) in
#   NATURAL j order — no output flip exists anywhere.
# * two real pipelines cost the same stage-1 MACs as ONE complex one
#   (the _real_ts_core_x2 K-stacked real dot), so the 4-pipeline kernel
#   pays ~2x a C2C kernel's MXU — mostly hidden under its DMA window.
# * exit chirps e^{-i pi k/n} / e^{-i pi (hl-1-j)/n} and the policy scalar
#   fold into (hl, 1) consts; the even/odd interleave is an in-kernel
#   concat + sublane merge writing the (1, n, TL) block directly — the
#   whole DCT-IV is ONE kernel pass, zero XLA epilogue.
# --------------------------------------------------------------------------


def dct4_mid_supported(n: int, dtype) -> bool:
    """Even n whose half length has a {128,256} twostep split, f32."""
    if not _use_pallas():
        return False
    if jnp.dtype(dtype) != jnp.float32 or n % 2 or n < 4 or n > 2 * _MAX_N:
        return False
    ts = _twostep_split(n // 2)
    if ts is None or ts[0] > config.max_base_radix:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def _jrev_chunks(t, m, f, tl):
    """(hl, tl) -> (hl, tl) with the f lane-chunks of each t'-row reversed
    (j -> f-1-j): static slices + concat, Mosaic-legal."""
    t3 = t.reshape(m, f, tl)
    return jnp.concatenate(
        [t3[:, jj:jj + 1, :] for jj in range(f - 1, -1, -1)],
        axis=1).reshape(m * f, tl)


def _dct4_kernel_mid(hl, m, f, mode, nc, x_ref, *refs):
    """Block (1, n, TL) real -> (1, n, TL): the whole DCT-IV in-kernel."""
    cs = [[r[:] for r in refs[i * nc:(i + 1) * nc]] for i in range(4)]
    pe_r, pe_i, po_r, po_i = [r[:] for r in refs[4 * nc:4 * nc + 4]]
    out_ref = refs[-1]
    tl = x_ref.shape[-1]
    xt = x_ref[:].reshape(hl, 2, tl)
    xe = xt[:, 0, :].reshape(m, f * tl)                  # x[2s]
    xodr = _jrev_chunks(xt[:, 1, :], m, f, tl).reshape(m, f * tl)
    ar, ai = _real_ts_core_x2(xe, cs[0], m, f, tl, mode, False, -1)
    br, bi = _real_ts_core_x2(xodr, cs[1], m, f, tl, mode, False, -1)
    gr_, gi_ = _real_ts_core_x2(xe, cs[2], m, f, tl, mode, False, +1)
    dr_, di_ = _real_ts_core_x2(xodr, cs[3], m, f, tl, mode, False, +1)
    er, ei = ar + br, ai + bi                            # E_k = FFT(c)_k
    gr, gi = gr_ + dr_, gi_ + di_                        # G_j = E_{hl-1-j}
    evens = er * pe_r + ei * pe_i                        # Re(E pe)
    odds = gr * po_i - gi * po_r                         # -Im(G po)
    out = jnp.concatenate([evens.reshape(hl, 1, tl),
                           odds.reshape(hl, 1, tl)], axis=1)
    out_ref[:] = out.reshape(1, 2 * hl, tl)              # interleave


@lru_cache(maxsize=64)
def _build_dct4_mid(n: int, nb: int, cols: int, dtype_str: str,
                    interpret: bool, mode: str, scale: float = 1.0,
                    tcfg: int = 0, donate: bool = False, msplit: int = 0):
    from .fft import _donate_kw

    dtype = jnp.dtype(dtype_str)
    hl = n // 2
    m0, f0 = _twostep_split(hl, msplit)
    tv = np.arange(m0, dtype=np.float64)
    jv = np.arange(f0, dtype=np.float64)
    # w_s = C0 a[t'] b[j]; q_s = qa[t'] qb[j] (odd-exit sign-+1 fold)
    c0 = np.exp(-1j * np.pi / (4 * n))
    a = np.exp(-1j * np.pi * tv * f0 / n)
    b = c0 * np.exp(-1j * np.pi * jv / n)
    qa = np.exp(2j * np.pi * tv * f0 / hl)
    qb = np.exp(2j * np.pi * jv / hl)
    rev = np.arange(m0)[::-1].copy()

    def fc(sign, pa, pb, perm=None):
        m, f, consts = _fft_consts(hl, sign, dtype, mode,
                                   pre_a=(pa.real, pa.imag),
                                   pre_b=(pb.real, pb.imag), row_perm=perm,
                                   m_pref=msplit)
        assert (m, f) == (m0, f0)
        return consts

    cons = (fc(-1, a, b) + fc(-1, a, 1j * b, rev)
            + fc(+1, a * qa, b * qb) + fc(+1, a * qa, 1j * b * qb, rev))
    nc = len(cons) // 4
    kv = np.arange(hl)
    ch = [np.asarray(v.reshape(hl, 1), dtype) for v in (
        scale * np.cos(np.pi * kv / n), scale * np.sin(np.pi * kv / n),
        scale * np.cos(np.pi * (hl - 1 - kv) / n),
        scale * np.sin(np.pi * (hl - 1 - kv) / n))]
    consts = cons + ch
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    sn = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                      memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct4_kernel_mid, hl, m0, f0, mode, nc),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[sn] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(12 * hl * np.log2(max(hl, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x: call(x, *consts)


def dct4_pallas_mid(x, scale=None):
    """(B, n, L) real -> scale * DCT-IV (rustdct base values) along axis 1,
    in ONE kernel pass (in-kernel interleave; no XLA epilogue at all)."""
    nb, n, cols = x.shape
    run = _build_dct4_mid(n, nb, cols, str(x.dtype),
                          bool(config.pallas_interpret), dot_mode(),
                          float(1.0 if scale is None else scale),
                          tcfg=int(config.pallas_tile),
                          donate=bool(config.donate_io),
                          msplit=_dct_msplit(n // 2))
    return run(x)


# --------------------------------------------------------------------------
# Fused DCT spectral pipeline: DCT-II -> diagonal multiply -> DCT-III in
# ONE kernel (the cosine-basis twin of rfft.py's _spectral_kernel_mid).
#
# The canonical Neumann-BC diagonal solve / filter is
# nddct3(H * nddct2(x)): two kernel passes plus a full HBM round-trip of
# the coefficient field. Here the coefficients never leave VMEM — the
# Makhoul forward, the multiply by H[k] and the two-pipeline inverse run
# back to back, so HBM traffic is read-n + write-n (same-shape real->real,
# donate_io-eligible chains). No reference analog (separate calls there,
# src/lib.rs:753-844).
# --------------------------------------------------------------------------


def _spectral_dct_kernel_mid(m, f, mode, nc2, nc3, h, x_ref, h_ref, *refs):
    """Block (1, n, TL) real -> (1, n, TL) = DCT-III(H * DCT-II(x)).

    ``nc2`` = dct2 core const count (then w_r, w_i); ``nc3`` = per-pipeline
    dct3 const count (cs1, cs2, then h0)."""
    cs_fwd = [r[:] for r in refs[:nc2]]
    w_r = refs[nc2][:]              # (n, 1) DCT-II post twiddle
    w_i = refs[nc2 + 1][:]
    cs1 = [r[:] for r in refs[nc2 + 2:nc2 + 2 + nc3]]
    cs2 = [r[:] for r in refs[nc2 + 2 + nc3:nc2 + 2 + 2 * nc3]]
    h0 = refs[nc2 + 2 + 2 * nc3][:]  # (n, 1) DCT-III x0-halving mask
    out_ref = refs[-1]
    tl = x_ref.shape[-1]
    n = m * f
    # ---- DCT-II (see _dct2_kernel_mid) ----
    xt = x_ref[:].reshape(h, 2, tl)              # free even/odd split
    xe = xt[:, 0, :].reshape(m // 2, f * tl)
    xo3 = xt[:, 1, :].reshape(m // 2, f, tl)
    xo2 = jnp.concatenate([xo3[:, jj, :] for jj in range(f - 1, -1, -1)],
                          axis=1)                # Makhoul j-reversal
    x2 = jnp.concatenate([xe, xo2], axis=0)
    zr, zi = _real_ts_core_x2(x2, cs_fwd, m, f, tl, mode, re_only=False)
    y = zr * w_r - zi * w_i                      # (n, TL) DCT-II values
    # ---- diagonal multiply ----
    y = y * h_ref[:]                             # (n, 1) broadcast
    # ---- DCT-III (see _dct3_kernel_mid) ----
    c = y * h0
    x3 = c.reshape(m, f * tl)
    zr1, _ = _real_ts_core_x2(x3, cs1, m, f, tl, mode, re_only=True)
    zr2, _ = _real_ts_core_x2(x3, cs2, m, f, tl, mode, re_only=True,
                              sign=+1)
    half = n // 2
    out = jnp.concatenate([zr1[:half].reshape(half, 1, tl),
                           zr2[:half].reshape(half, 1, tl)], axis=1)
    out_ref[:] = out.reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_spectral_dct_mid(n: int, nb: int, cols: int, dtype_str: str,
                            interpret: bool, mode: str, scale2: float,
                            scale3: float, tcfg: int = 0,
                            donate: bool = False, msplit: int = 0,
                            h_cols: int = 1):
    """(B, n, L) real + (n,) or (n, L) H -> (B, n, L) real, axis 1.

    ``h_cols``: 1 for a broadcast H, ``cols`` for lane-varying (streams
    one (n, tile) block per grid step).

    ``scale2``/``scale3`` are the handlers' pre-transform scalars (DCT
    normalization applies BEFORE each transform; both fold into the
    respective pipeline constants). ``donate`` aliases the output onto
    the x operand (same shape)."""
    from .fft import _donate_kw

    dtype = jnp.dtype(dtype_str)
    m0, f0 = _twostep_split(n, msplit)
    perm = np.concatenate([np.arange(m0 // 2),
                           np.arange(m0 - 1, m0 // 2 - 1, -1)])
    m, f, cs_fwd = _fft_consts(n, -1, dtype, mode, scale=scale2,
                               row_perm=perm, m_pref=msplit)
    nc2 = len(cs_fwd)
    k = np.arange(n, dtype=np.int64)
    w = _cis(k, 2 * n, -1)
    cs_fwd = cs_fwd + [np.asarray(w[0], dtype).reshape(n, 1),
                       np.asarray(w[1], dtype).reshape(n, 1)]
    tp = np.arange(m0, dtype=np.int64)
    a = _cis(tp, 2 * m0, -1)
    j = np.arange(f0, dtype=np.int64)
    b = _cis(j, 2 * n, -1)
    _, _, cs1 = _fft_consts(n, -1, dtype, mode, scale=scale3,
                            pre_a=a, pre_b=b, re_only_s2=True,
                            m_pref=msplit)
    a2 = _cis(3 * tp * f0, 2 * n, +1)
    b2 = _cis(3 * j, 2 * n, +1)
    _, _, cs2 = _fft_consts(n, +1, dtype, mode, scale=scale3,
                            pre_a=a2, pre_b=b2, re_only_s2=True,
                            m_pref=msplit)
    h0 = np.ones((n, 1), dtype)
    h0[0, 0] = 0.5
    consts = cs_fwd + cs1 + cs2 + [h0]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    sn = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                      memory_space=pltpu.VMEM)
    h_spec = (pl.BlockSpec((n, 1), lambda g: (0, 0),
                           memory_space=pltpu.VMEM) if h_cols == 1 else
              pl.BlockSpec((n, tile), lambda g: (0, g % gc),
                           memory_space=pltpu.VMEM))
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_spectral_dct_kernel_mid, m, f, mode, nc2, len(cs1),
                n // 2),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[sn, h_spec] + const_specs,
        out_specs=sn,
        cost_estimate=pl.CostEstimate(
            flops=int(13 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x, hv: call(x, hv, *consts)


def spectral_dct_pallas_mid(x, hv, scale2=None, scale3=None):
    """(B, n, L) real, (n, 1) or (n, L) H -> (B, n, L) real, axis 1."""
    nb, n, cols = x.shape
    run = _build_spectral_dct_mid(n, nb, cols, str(x.dtype),
                                  bool(config.pallas_interpret), dot_mode(),
                                  float(1.0 if scale2 is None else scale2),
                                  float(1.0 if scale3 is None else scale3),
                                  tcfg=int(config.pallas_tile),
                                  donate=bool(config.donate_io),
                                  msplit=_dct_msplit(n),
                                  h_cols=int(hv.shape[-1]))
    return run(x, hv)
