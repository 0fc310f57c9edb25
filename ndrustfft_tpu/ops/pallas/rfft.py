"""Fused Pallas kernels for R2C forward / C2R inverse (even n) — Mosaic-legal.

The realfft capability (SURVEY.md §2.2 N2) as single kernels: the half-size
complex FFT AND the split/merge (un)packing run in VMEM, so the spectrum
never round-trips HBM between the FFT and the (un)pack as it does in the
XLA lowering.

Round 1's formulation used lane-dim flips and a stack+reshape interleave,
both rejected by Mosaic on real TPU (NOTES_TPU.md), so the kernels were
interpreter-only. The rewrite eliminates every illegal op via an FFT
identity: the spectrum mirror is itself an FFT of the conjugated input,

    Z[(h - k) mod h] = FFT_{+s}(z)[k]          (s = transform sign)
    =>  conj(Z[(h-k) mod h]) = FFT_{s}(conj(z))[k],

so both mirror-dependent passes become ONE batched FFT over a doubled
batch ([z; conj(z)]), followed by elementwise combines, static slices and
concats — all Mosaic-legal. Derivations:

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
constant), never inside the kernel.

Two kernel families:

* NATURAL-LAYOUT kernels (``*_nat``, round 2, the production path for
  twostep-eligible h): consume/produce the user's memory layout directly so
  NO boundary HBM passes remain —
  - r2c: block (T, n) real; the entry transpose (T, n) -> (n, T) makes the
    even/odd de-interleave FREE (reshape (h, 2, T) + middle-dim slices,
    both legal — a strided lane slice is not). No external pack pass.
  - c2r: emits (T, n) real directly; the even/odd INTERLEAVE is a
    sublane-interleaved build (h, 2, T) -> (2h, T) (middle concat + leading
    merge) followed by ONE legal 2-D transpose. No external interleave pass.
  - c2r fuses the reference's pre-steps (src/lib.rs:506-523): the
    normalization scalar rides the a/c/b0 constants and the DC/Nyquist
    imag-zeroing is in-kernel (a (h,1) mask; the Nyquist imag is simply
    never read). No external norm/mask pass.
  The half-FFT runs on the n-leading twostep core (fft._ts_core_nlead)
  with the doubled batch in COLUMNS ([z | conj z]).

* packed kernels (round-2 original): (B, h) even/odd stream pairs in, used
  by callers that produce split streams themselves (engine.r2c_packed —
  e.g. the DCT-I even extension) and for h without a twostep split.

Odd n keeps the XLA engine path (row-paired C2C).
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
from ...plan import R2CPlan, _cis, get_c2c_plan
from .fft import (
    _VMEM_LIMIT,
    _flat_consts,
    _ks_real_dot,
    _lane_last_math,
    _lane_tile,
    _nlead_consts,
    _nlead_core,
    _plan_consts,
    _ts_core_nlead,
    _twostep_consts,
    _twostep_math,
    _twostep_split,
    _unflat,
    dot_mode,
    lane_tile_for,
    mid_core_body,
    pallas_supported,
)


def rfft_pallas_supported(plan: R2CPlan, dtype) -> bool:
    if not plan.half:
        return False
    return pallas_supported(plan.sub, dtype)


def _nat_ts(h: int, m_pref: int = 0):
    """Twostep split for the natural-layout kernels' half-FFT, or None.

    ``m_pref`` forces the sublane factor m (config.rfft_split): the
    half-FFT's per-q stage-2 dots are 12 m^2 f L MACs/tile — linear in m —
    so m=64 halves the kernels' MXU work where it divides h (blessed per-n
    from the on-chip A/B, tools/split_probe.py)."""
    ts = _twostep_split(h, m_pref)
    if h >= 256 and ts is not None and ts[0] <= config.max_base_radix:
        return ts
    return None


def _rfft_msplit(h: int) -> int:
    """Effective half-FFT split preference (0 = measured per-h default)."""
    forced = int(config.rfft_split)
    if forced:
        return forced
    return _RFFT_MSPLIT_DEFAULT.get(h, 0)


# per-h measured winners (on-chip A/B); empty until a probe blesses entries
_RFFT_MSPLIT_DEFAULT = {}


def rfft_nat_supported(plan: R2CPlan, dtype) -> bool:
    """Natural-layout kernel eligibility: twostep-eligible half length."""
    return rfft_pallas_supported(plan, dtype) and _nat_ts(plan.n // 2) is not None


def _half_fft_consts(h: int, sign: int, dtype, mode: str):
    """Kernel-schedule constants for the length-h lane-last FFT.

    Prefers the twostep body (all 2-D matmuls — measured 1.5-2x faster than
    the recursive leading-dot form); falls back to the generic lane-last
    schedule for h without a {128,256} split."""
    ts = _twostep_split(h)
    if h > 256 and ts is not None and ts[0] <= config.max_base_radix:
        consts, (m, f) = _twostep_consts(h, sign, dtype, mode)
        return consts, ("ts", m, f, sign)
    f, m, mid, lane, tw = _plan_consts(h, sign, dtype)
    consts, struct, has_base, has_tw = _flat_consts(mid, lane, tw)
    return consts, ("gen", struct, has_base, has_tw, m, f)


def _half_fft(wr, wi, const_vals, meta, mode):
    """Run the length-h FFT on a (rows, h) complex pair inside a kernel."""
    if meta[0] == "ts":
        _, m, f, sign = meta
        return _twostep_math(wr, wi, const_vals, m, f, wr.shape[0], mode,
                             sign)
    _, struct, has_base, has_tw, m, f = meta
    stages, base, lane, tw = _unflat(const_vals, struct, has_base, has_tw)
    return _lane_last_math(wr, wi, stages, base, lane, tw, m, f, mode)


# --------------------------------------------------------------------------
# packed kernels: (B, h) even/odd stream pairs (engine.r2c_packed callers)
# --------------------------------------------------------------------------


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


def r2c_pallas(xe, xo, plan: R2CPlan):
    """(B, h) even/odd real streams -> (B, m) split re/im via the fused
    kernel (caller produces the split streams, e.g. the DCT-I extension)."""
    batch, _h = xe.shape
    run = _build_r2c(plan.n, batch, str(xe.dtype),
                     bool(config.pallas_interpret), dot_mode())
    return run(xe, xo)


# --------------------------------------------------------------------------
# natural-layout kernels: user memory layout in/out, zero boundary passes
# --------------------------------------------------------------------------


def _r2c_kernel_nat(core, m_, f_, mode, h, x_ref, *refs):
    """Block (T, n) real -> ((T, m) re, (T, m) im), m = h + 1.

    The entry transpose puts n leading; (n, T) -> (h, 2, T) + middle slices
    de-interleave even/odd samples for free (reference realfft pack,
    src/lib.rs:497-503, without the external strided-slice pass)."""
    const_vals = [r[:] for r in refs[:-4]]
    ur = refs[-4][:]                # (h, 1) column unpack twiddle
    ui = refs[-3][:]
    or_ref, oi_ref = refs[-2:]
    t = x_ref.shape[0]
    xt = x_ref[:].T.reshape(h, 2, t)
    xe = xt[:, 0, :]                # (h, T)
    xo = xt[:, 1, :]
    # columns [z | conj(z)] through one n-leading FFT_h
    wr = jnp.concatenate([xe, xe], axis=1)
    wi = jnp.concatenate([xo, -xo], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, -1)
    zr, zi = yr[:, :t], yi[:, :t]
    cr, ci = yr[:, t:], yi[:, t:]
    fer = 0.5 * (zr + cr)
    fei = 0.5 * (zi + ci)
    for_ = 0.5 * (zi - ci)          # Re(-i/2 (Z - C))
    foi = -0.5 * (zr - cr)          # Im(-i/2 (Z - C))
    xr = fer + for_ * ur - foi * ui        # (h, T)
    xi = fei + for_ * ui + foi * ur
    last = zr[:1, :] - zi[:1, :]    # Nyquist row X[h] = Re Z[0] - Im Z[0]
    or_ref[:] = jnp.concatenate([xr, last], axis=0).T       # (T, m)
    oi_ref[:] = jnp.concatenate([xi, jnp.zeros_like(last)], axis=0).T


@lru_cache(maxsize=256)
def _build_r2c_nat(n: int, batch: int, dtype_str: str, interpret: bool,
                   mode: str, core: str = "bts2", msplit: int = 0):
    """(B, n) real -> (B, m) split re/im spectrum; no external pack pass."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, -1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)     # W_n^k, k = 0..h-1
    consts = consts + [np.asarray(ur, dtype).reshape(h, 1),
                       np.asarray(ui, dtype).reshape(h, 1)]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_kernel_nat, core, m_, f_, mode, h),
        out_shape=(jax.ShapeDtypeStruct((batch, m), dtype),
                   jax.ShapeDtypeStruct((batch, m), dtype)),
        grid=grid,
        in_specs=[in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(3 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


def r2c_pallas_nat(x, plan: R2CPlan):
    """(B, n) real -> (B, m) split re/im via the natural-layout kernel."""
    batch, _n = x.shape
    run = _build_r2c_nat(plan.n, batch, str(x.dtype),
                         bool(config.pallas_interpret), dot_mode(),
                         core=mid_core_body(),
                         msplit=_rfft_msplit(plan.n // 2))
    return run(x)


def _c2r_kernel_nat(core, m_, f_, mode, h, sr_ref, si_ref, *refs):
    """Blocks (T, m) re/im RAW spectrum -> (T, n) real samples.

    Fuses the reference's pre-steps (src/lib.rs:506-523): the normalization
    scalar is baked into the a/c/b0 constants, the DC imag is zeroed by the
    (h,1) mask constant, and the Nyquist imag is never read. The even/odd
    interleave is a sublane-interleaved build + ONE legal 2-D transpose."""
    const_vals = [r[:] for r in refs[:-7]]
    ar, ai = refs[-7][:], refs[-6][:]        # (h, 1), scale-folded
    cr_, ci_ = refs[-5][:], refs[-4][:]      # (h, 1): c[j] = b[(h-j)%h]*s
    b0 = refs[-3][:]                         # (2, 1): [Re b0*s; Im b0*s]
    mk = refs[-2][:]                         # (h, 1): 1, except mk[0] = 0
    sr_t = sr_ref[:].T                       # (m, T)
    si_t = si_ref[:].T
    o_ref = refs[-1]
    t = sr_ref.shape[0]
    skr = sr_t[:h, :]
    ski = si_t[:h, :] * mk                   # DC imag forced 0 (src:517)
    # P = a * S
    pr = ar * skr - ai * ski
    pi = ar * ski + ai * skr
    # Q = c * conj(S); Q[0] += b0 * conj(S[h]) — Nyquist imag never read
    # (src/lib.rs:519-521 forces it to 0 for even n)
    qr = cr_ * skr + ci_ * ski
    qi = ci_ * skr - cr_ * ski
    snr = sr_t[h:, :]                        # (1, T) Nyquist re
    q0r = qr[:1, :] + b0[:1, :] * snr
    q0i = qi[:1, :] + b0[1:, :] * snr
    qr = jnp.concatenate([q0r, qr[1:, :]], axis=0)
    qi = jnp.concatenate([q0i, qi[1:, :]], axis=0)
    # columns [P | conj(Q)] through one n-leading IFFTu_h (+1 consts)
    wr = jnp.concatenate([pr, qr], axis=1)
    wi = jnp.concatenate([pi, -qi], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, +1)
    # z = IFFTu(P) + conj(IFFTu(conj Q)); x[2l] = 2 Re z, x[2l+1] = 2 Im z
    ev = 2.0 * (yr[:, :t] + yr[:, t:])       # (h, T)
    od = 2.0 * (yi[:, :t] - yi[:, t:])
    d = jnp.concatenate([ev.reshape(h, 1, t), od.reshape(h, 1, t)], axis=1)
    o_ref[:] = d.reshape(2 * h, t).T         # (T, n), lane index 2l + c


@lru_cache(maxsize=256)
def _build_c2r_nat(n: int, batch: int, dtype_str: str, interpret: bool,
                   mode: str, scale: float, core: str = "bts2",
                   msplit: int = 0):
    """(B, m) RAW split re/im spectrum -> (B, n) real; normalization and
    DC/Nyquist masking fused (no external passes)."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, +1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, +1)     # W_n^{-k} under the forward convention
    a_r, a_i = 0.5 * (1.0 - ui), 0.5 * ur          # (1 + i u)/2
    b_r, b_i = 0.5 * (1.0 + ui), -0.5 * ur         # (1 - i u)/2
    # c[j] = b[(h - j) % h] with c[0] zeroed (j=0 term comes from Nyquist)
    idx = (-k) % h
    c_r, c_i = b_r[idx].copy(), b_i[idx].copy()
    c_r[0] = 0.0
    c_i[0] = 0.0
    mk = np.ones((h, 1), np.float64)
    mk[0, 0] = 0.0
    consts = consts + [
        np.asarray(a_r * scale, dtype).reshape(h, 1),
        np.asarray(a_i * scale, dtype).reshape(h, 1),
        np.asarray(c_r * scale, dtype).reshape(h, 1),
        np.asarray(c_i * scale, dtype).reshape(h, 1),
        np.asarray([[b_r[0] * scale], [b_i[0] * scale]], dtype),
        np.asarray(mk, dtype),
    ]
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)
    grid = (pl.cdiv(batch, tile),)
    in_spec = pl.BlockSpec((tile, m), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_c2r_kernel_nat, core, m_, f_, mode, h),
        out_shape=jax.ShapeDtypeStruct((batch, n), dtype),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(3 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda sr, si: call(sr, si, *consts)


def c2r_pallas_nat(sr, si, n: int, scale=None):
    """(B, m) RAW split re/im spectrum -> (B, n) real samples via the
    natural-layout kernel; ``scale`` (python float) and the reference's
    DC/Nyquist imag-zeroing are fused into the kernel."""
    batch = sr.shape[0]
    run = _build_c2r_nat(n, batch, str(sr.dtype),
                         bool(config.pallas_interpret), dot_mode(),
                         float(1.0 if scale is None else scale),
                         core=mid_core_body(),
                         msplit=_rfft_msplit(n // 2))
    return run(sr, si)


# --------------------------------------------------------------------------
# axis-mid natural kernels: transform along the MIDDLE axis of (B, n, L)
# blocks. In this orientation the even/odd (de)interleave is FREE — a
# middle-dim reshape (1, n, TL) <-> (h, 2, TL) is Mosaic-legal (only the
# LANE dim may not be split), so these kernels have ZERO transposes at
# either boundary, and the API avoids its moveaxis HBM passes for every
# non-minor transform axis (the reference benchmark configuration).
# --------------------------------------------------------------------------


def _r2c_kernel_mid(core, m_, f_, mode, h, x_ref, *refs):
    """Block (1, n, TL) real -> ((1, m, TL) re, (1, m, TL) im)."""
    const_vals = [r[:] for r in refs[:-4]]
    ur = refs[-4][:]                # (h, 1) column unpack twiddle
    ui = refs[-3][:]
    or_ref, oi_ref = refs[-2:]
    tl = x_ref.shape[-1]
    xt = x_ref[:].reshape(h, 2, tl)          # free even/odd de-interleave
    xe = xt[:, 0, :]                         # (h, TL)
    xo = xt[:, 1, :]
    wr = jnp.concatenate([xe, xe], axis=1)   # columns [z | conj(z)]
    wi = jnp.concatenate([xo, -xo], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, -1)
    zr, zi = yr[:, :tl], yi[:, :tl]
    cr, ci = yr[:, tl:], yi[:, tl:]
    fer = 0.5 * (zr + cr)
    fei = 0.5 * (zi + ci)
    for_ = 0.5 * (zi - ci)
    foi = -0.5 * (zr - cr)
    xr = fer + for_ * ur - foi * ui          # (h, TL)
    xi = fei + for_ * ui + foi * ur
    last = zr[:1, :] - zi[:1, :]             # Nyquist row
    or_ref[:] = jnp.concatenate([xr, last], axis=0).reshape(1, h + 1, tl)
    oi_ref[:] = jnp.concatenate([xi, jnp.zeros_like(last)],
                                axis=0).reshape(1, h + 1, tl)


def _c2r_kernel_mid(core, m_, f_, mode, h, sr_ref, si_ref, *refs):
    """Blocks (1, m, TL) re/im RAW spectrum -> (1, n, TL) real; the
    reference pre-steps fused as in _c2r_kernel_nat; the even/odd
    interleave is a free middle-dim reshape."""
    const_vals = [r[:] for r in refs[:-7]]
    ar, ai = refs[-7][:], refs[-6][:]        # (h, 1), scale-folded
    cr_, ci_ = refs[-5][:], refs[-4][:]
    b0 = refs[-3][:]                         # (2, 1)
    mk = refs[-2][:]                         # (h, 1)
    o_ref = refs[-1]
    tl = sr_ref.shape[-1]
    sr_t = sr_ref[:].reshape(h + 1, tl)
    si_t = si_ref[:].reshape(h + 1, tl)
    skr = sr_t[:h, :]
    ski = si_t[:h, :] * mk                   # DC imag forced 0
    pr = ar * skr - ai * ski
    pi = ar * ski + ai * skr
    qr = cr_ * skr + ci_ * ski
    qi = ci_ * skr - cr_ * ski
    snr = sr_t[h:, :]                        # Nyquist re (imag never read)
    q0r = qr[:1, :] + b0[:1, :] * snr
    q0i = qi[:1, :] + b0[1:, :] * snr
    qr = jnp.concatenate([q0r, qr[1:, :]], axis=0)
    qi = jnp.concatenate([q0i, qi[1:, :]], axis=0)
    wr = jnp.concatenate([pr, qr], axis=1)   # columns [P | conj(Q)]
    wi = jnp.concatenate([pi, -qi], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, +1)
    ev = 2.0 * (yr[:, :tl] + yr[:, tl:])     # (h, TL)
    od = 2.0 * (yi[:, :tl] - yi[:, tl:])
    d = jnp.concatenate([ev.reshape(h, 1, tl), od.reshape(h, 1, tl)], axis=1)
    o_ref[:] = d.reshape(1, 2 * h, tl)       # free interleave


def _mid_tile(cols: int, tcfg: int = 0) -> int:
    """Shared lane-tile policy (fft.lane_tile_for) at the R2C/C2R builders'
    measured 256 cap; tcfg (config.pallas_tile) snaps to a legal width."""
    return lane_tile_for(cols, tcfg, 256)


@lru_cache(maxsize=256)
def _build_r2c_mid(n: int, nb: int, cols: int, dtype_str: str,
                   interpret: bool, mode: str, tcfg: int = 0,
                   core: str = "bts2", msplit: int = 0):
    """(B, n, L) real -> (B, m, L) split re/im, transform along axis 1."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, -1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)
    consts = consts + [np.asarray(ur, dtype).reshape(h, 1),
                       np.asarray(ui, dtype).reshape(h, 1)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, m, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_kernel_mid, core, m_, f_, mode, h),
        out_shape=(jax.ShapeDtypeStruct((nb, m, cols), dtype),
                   jax.ShapeDtypeStruct((nb, m, cols), dtype)),
        grid=grid,
        in_specs=[in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


@lru_cache(maxsize=256)
def _build_c2r_mid(n: int, nb: int, cols: int, dtype_str: str,
                   interpret: bool, mode: str, scale: float, tcfg: int = 0,
                   core: str = "bts2", msplit: int = 0):
    """(B, m, L) RAW split re/im -> (B, n, L) real, transform along axis 1;
    normalization + DC/Nyquist masking fused."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, +1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, +1)
    a_r, a_i = 0.5 * (1.0 - ui), 0.5 * ur
    b_r, b_i = 0.5 * (1.0 + ui), -0.5 * ur
    idx = (-k) % h
    c_r, c_i = b_r[idx].copy(), b_i[idx].copy()
    c_r[0] = 0.0
    c_i[0] = 0.0
    mk = np.ones((h, 1), np.float64)
    mk[0, 0] = 0.0
    consts = consts + [
        np.asarray(a_r * scale, dtype).reshape(h, 1),
        np.asarray(a_i * scale, dtype).reshape(h, 1),
        np.asarray(c_r * scale, dtype).reshape(h, 1),
        np.asarray(c_i * scale, dtype).reshape(h, 1),
        np.asarray([[b_r[0] * scale], [b_i[0] * scale]], dtype),
        np.asarray(mk, dtype),
    ]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, m, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_c2r_kernel_mid, core, m_, f_, mode, h),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda sr, si: call(sr, si, *consts)


def r2c_pallas_mid(x, plan: R2CPlan):
    """(B, n, L) real -> (B, m, L) split re/im along axis 1 (no moveaxis,
    no transposes — the axis-mid natural kernel)."""
    nb, n, cols = x.shape
    run = _build_r2c_mid(n, nb, cols, str(x.dtype),
                         bool(config.pallas_interpret), dot_mode(),
                         tcfg=int(config.pallas_tile),
                         core=mid_core_body(),
                         msplit=_rfft_msplit(n // 2))
    return run(x)


def c2r_pallas_mid(sr, si, n: int, scale=None):
    """(B, m, L) RAW split re/im -> (B, n, L) real along axis 1."""
    nb, _m, cols = sr.shape
    run = _build_c2r_mid(n, nb, cols, str(sr.dtype),
                         bool(config.pallas_interpret), dot_mode(),
                         float(1.0 if scale is None else scale),
                         tcfg=int(config.pallas_tile),
                         core=mid_core_body(),
                         msplit=_rfft_msplit(n // 2))
    return run(sr, si)


def _r2c_kernel_packed_mid(core, m_, f_, mode, h, scale, xe_ref, xo_ref, *refs):
    """Blocks (1, h, TL) even/odd streams -> ((1, m, TL) re, im) * scale.

    Mid-axis packed variant for callers that assemble the streams
    themselves (the DCT-I even extension); ``scale`` (e.g. DCT-I's 0.5 x
    norm) is folded into the combine literals."""
    const_vals = [r[:] for r in refs[:-4]]
    ur = refs[-4][:]                # (h, 1), pre-scaled at build
    ui = refs[-3][:]
    or_ref, oi_ref = refs[-2:]
    tl = xe_ref.shape[-1]
    xe = xe_ref[:].reshape(h, tl)
    xo = xo_ref[:].reshape(h, tl)
    wr = jnp.concatenate([xe, xe], axis=1)
    wi = jnp.concatenate([xo, -xo], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, -1)
    zr, zi = yr[:, :tl], yi[:, :tl]
    cr, ci = yr[:, tl:], yi[:, tl:]
    half_s = 0.5 * scale
    fer = half_s * (zr + cr)
    fei = half_s * (zi + ci)
    for_ = half_s * (zi - ci)
    foi = -half_s * (zr - cr)
    xr = fer + for_ * ur - foi * ui          # ur/ui carry NO extra scale
    xi = fei + for_ * ui + foi * ur
    last = scale * (zr[:1, :] - zi[:1, :])
    or_ref[:] = jnp.concatenate([xr, last], axis=0).reshape(1, h + 1, tl)
    oi_ref[:] = jnp.concatenate([xi, jnp.zeros_like(last)],
                                axis=0).reshape(1, h + 1, tl)


@lru_cache(maxsize=256)
def _build_r2c_packed_mid(n: int, nb: int, cols: int, dtype_str: str,
                          interpret: bool, mode: str, scale: float,
                          tcfg: int = 0, core: str = "bts2",
                          msplit: int = 0):
    """(B, h, L) even/odd pair -> (B, m, L) split re/im * scale, axis 1."""
    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, -1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)
    consts = consts + [np.asarray(ur, dtype).reshape(h, 1),
                       np.asarray(ui, dtype).reshape(h, 1)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, h, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, m, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_kernel_packed_mid, core, m_, f_, mode, h, scale),
        out_shape=(jax.ShapeDtypeStruct((nb, m, cols), dtype),
                   jax.ShapeDtypeStruct((nb, m, cols), dtype)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda xe, xo: call(xe, xo, *consts)


def r2c_pallas_packed_mid(xe, xo, n: int, scale=None):
    """(B, h, L) even/odd streams -> (B, m, L) split re/im * scale along
    axis 1 (the DCT-I even-extension caller)."""
    nb, _h, cols = xe.shape
    run = _build_r2c_packed_mid(n, nb, cols, str(xe.dtype),
                                bool(config.pallas_interpret), dot_mode(),
                                float(1.0 if scale is None else scale),
                                tcfg=int(config.pallas_tile),
                                core=mid_core_body(),
                                msplit=_rfft_msplit(n // 2))
    return run(xe, xo)


# --------------------------------------------------------------------------
# DCT-I natural-layout kernel (axis-mid, odd n): the even-extension
# streams are built IN-KERNEL from the natural block and its middle-flip
# (reshape + plain slices + concats — all Mosaic-legal in this
# orientation), replacing the pathological strided-slice XLA assembly
# that cost ~40x data size (round-2 verdict weak #4 / NOTES_TPU.md
# "Known pathology"). XLA contributes exactly ONE cheap pass: the flip.
# Output is the real half-spectrum only (DCT-I is real), halving the
# kernel's write traffic vs the packed r2c path.
# --------------------------------------------------------------------------


def _dct1_kernel_mid(core, m_, f_, mode, n, scale, x_ref, xf_ref, *refs):
    """(1, n, TL) natural block + its flip -> (1, n, TL) DCT-I * scale.

    With n = 2p+1, h = n-1 and e the even extension (len 2h), the streams
    are  xe = [x[0::2], x[h], xf[2:h:2]]  and  xo = [x[1::2], xf[1::2]]
    where xf[j] = x[n-1-j]; both come out of the (p, 2, TL) pairs view by
    plain slicing. Math below = the packed-mid r2c combine
    (``_r2c_kernel_packed_mid``) restricted to the real output rows."""
    const_vals = [r[:] for r in refs[:-3]]
    ur = refs[-3][:]                  # (h, 1)
    ui = refs[-2][:]
    or_ref = refs[-1]
    tl = x_ref.shape[-1]
    x = x_ref[:].reshape(n, tl)
    xf = xf_ref[:].reshape(n, tl)
    h = n - 1
    p = h // 2
    xp = x[:h].reshape(p, 2, tl)
    fp = xf[:h].reshape(p, 2, tl)
    xe = jnp.concatenate([xp[:, 0, :], x[h:h + 1, :], fp[1:p, 0, :]], axis=0)
    xo = jnp.concatenate([xp[:, 1, :], fp[:, 1, :]], axis=0)
    wr = jnp.concatenate([xe, xe], axis=1)
    wi = jnp.concatenate([xo, -xo], axis=1)
    yr, yi = _nlead_core(core, wr, wi, const_vals, m_, f_, mode, -1)
    zr, zi = yr[:, :tl], yi[:, :tl]
    cr, ci = yr[:, tl:], yi[:, tl:]
    half_s = 0.5 * scale
    fer = half_s * (zr + cr)
    for_ = half_s * (zi - ci)
    foi = -half_s * (zr - cr)
    xr = fer + for_ * ur - foi * ui
    last = scale * (zr[:1, :] - zi[:1, :])
    or_ref[:] = jnp.concatenate([xr, last], axis=0).reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_dct1_mid(n: int, nb: int, cols: int, dtype_str: str,
                    interpret: bool, mode: str, scale: float, tcfg: int = 0,
                    core: str = "bts2", donate: bool = False,
                    msplit: int = 0):
    """(B, n, L) x and flip(x) -> (B, n, L) DCT-I * scale along axis 1.

    ``donate`` aliases the output onto the FIRST operand (x): xf is a
    separate materialized array, so per-block in-place writes are safe."""
    from .fft import _donate_kw
    h = n - 1
    ext = 2 * h
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    consts, _ = _nlead_consts(h, -1, dtype, mode, body=core, m_pref=msplit)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, ext, -1)
    consts = consts + [np.asarray(ur, dtype).reshape(h, 1),
                       np.asarray(ui, dtype).reshape(h, 1)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_dct1_kernel_mid, core, m_, f_, mode, n, scale),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[spec, spec] + const_specs,
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=int(10 * ext * np.log2(max(ext, 2)) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, nplanes=1),
    )
    return lambda x, xf: call(x, xf, *consts)


def dct1_mid_supported(n: int, dtype) -> bool:
    """Natural DCT-I kernel eligibility: odd n >= 5 with a twostep-eligible
    h = n-1 (the reference's 2^k+1 bench sizes all qualify)."""
    if not _use_pallas() or jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 5 or n % 2 == 0 or _nat_ts(n - 1) is None:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def dct1_pallas_mid(x, scale=None):
    """(B, n, L) -> (B, n, L) DCT-I * scale along axis 1 (natural layout)."""
    nb, n, cols = x.shape
    xf = jnp.flip(x, axis=1)
    run = _build_dct1_mid(n, nb, cols, str(x.dtype),
                          bool(config.pallas_interpret), dot_mode(),
                          float(1.0 if scale is None else scale),
                          tcfg=int(config.pallas_tile),
                          core=mid_core_body(),
                          donate=bool(config.donate_io),
                          msplit=_rfft_msplit(n - 1))
    return run(x, xf)


# --------------------------------------------------------------------------
# dense-matrix R2C/C2R kernels (axis-mid): for even n without a twostep-
# eligible half (n <= 512), the whole forward/inverse real transform is
# ONE K-stacked real MXU dot with zero relayouts. The C2R matrix absorbs
# the Hermitian extension, the DC/Nyquist imag masking AND the
# normalization: B's DC/Nyquist columns are zero and every entry carries
# the scale — the entire reference ifft_r2c semantics as one constant.
# --------------------------------------------------------------------------

_DENSE_RFFT_MAX = 1100    # same one-dot-beats-fused cap as the DCT dense
                          # kernel (NOTES_TPU.md dense-kernel findings)


def rfft_dense_mid_supported(n: int, dtype) -> bool:
    """Any n (odd included — round-2 verdict weak #5: odd R2C/C2R never
    reached a kernel) up to the dense cap."""
    if not _use_pallas():
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 4 or n > _DENSE_RFFT_MAX:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def _r2c_dense_w(n: int):
    """(n, 2m) f64: [cos(2pi t k/n) | -sin(2pi t k/n)] columns."""
    t = np.arange(n, dtype=np.int64)
    k = np.arange(n // 2 + 1, dtype=np.int64)
    cr, si = _cis(2 * np.outer(t, k), n, -1)   # e^{-i 2pi tk/n}
    return np.concatenate([cr, si], axis=1)    # si already carries the -


def _c2r_dense_w(n: int, scale: float):
    """(2m, n): rows [A^T; B^T] with x = A S_re + B S_im; the Hermitian
    fold (x2 weights), DC — and for even n Nyquist — masking (zero B
    columns) and ``scale`` are all in the constants. Odd n has no Nyquist
    bin: k = m-1 is a regular doubled bin (reference src/lib.rs:519-521
    zeroes Nyquist only when n is even)."""
    h = n // 2
    m = h + 1
    t = np.arange(n, dtype=np.int64)
    k = np.arange(m, dtype=np.int64)
    cr, sn = _cis(2 * np.outer(t, k), n, +1)   # e^{+i 2pi tk/n}
    a = 2.0 * cr                                # (n, m)
    b = -2.0 * sn
    a[:, 0] *= 0.5
    b[:, 0] = 0.0                               # DC imag never read
    if n % 2 == 0:
        a[:, h] *= 0.5
        b[:, h] = 0.0                           # Nyquist imag never read
    return np.concatenate([a.T, b.T], axis=0) * scale   # (2m, n)


def _r2c_dense_kernel(n, mode, x_ref, *refs):
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    tl = x_ref.shape[-1]
    m = n // 2 + 1
    x = x_ref[:].reshape(n, tl)
    if mode == "bf16x3":
        z, _ = _ks_real_dot(x, None, None, mode, im_out=False, w3=consts[0])
    else:
        from .fft import _dg

        z = _dg(consts[0], x, (((0,), (0,)), ((), ())), mode)
    or_ref[:] = z[:m, :].reshape(1, m, tl)
    oi_ref[:] = z[m:, :].reshape(1, m, tl)


def _c2r_dense_kernel(n, mode, sr_ref, si_ref, *refs):
    consts = [r[:] for r in refs[:-1]]
    o_ref = refs[-1]
    tl = sr_ref.shape[-1]
    m = n // 2 + 1
    x2 = jnp.concatenate([sr_ref[:].reshape(m, tl),
                          si_ref[:].reshape(m, tl)], axis=0)
    if mode == "bf16x3":
        z, _ = _ks_real_dot(x2, None, None, mode, im_out=False, w3=consts[0])
    else:
        from .fft import _dg

        z = _dg(consts[0], x2, (((0,), (0,)), ((), ())), mode)
    o_ref[:] = z.reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_r2c_dense_mid(n: int, nb: int, cols: int, dtype_str: str,
                         interpret: bool, mode: str, tcfg: int = 0):
    from .fft import ks_w3_np

    dtype = jnp.dtype(dtype_str)
    m = n // 2 + 1
    w = _r2c_dense_w(n)
    consts = [ks_w3_np(w) if mode == "bf16x3" else np.asarray(w, dtype)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, m, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_r2c_dense_kernel, n, mode),
        out_shape=(jax.ShapeDtypeStruct((nb, m, cols), dtype),
                   jax.ShapeDtypeStruct((nb, m, cols), dtype)),
        grid=grid,
        in_specs=[in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * (2 * m) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda x: call(x, *consts)


@lru_cache(maxsize=256)
def _build_c2r_dense_mid(n: int, nb: int, cols: int, dtype_str: str,
                         interpret: bool, mode: str, scale: float, tcfg: int = 0):
    from .fft import ks_w3_np

    dtype = jnp.dtype(dtype_str)
    m = n // 2 + 1
    w = _c2r_dense_w(n, scale)
    consts = [ks_w3_np(w) if mode == "bf16x3" else np.asarray(w, dtype)]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, m, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_c2r_dense_kernel, n, mode),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * (2 * m) * nb * cols),
            bytes_accessed=int(3 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda sr, si: call(sr, si, *consts)


def r2c_dense_pallas_mid(x, plan: R2CPlan):
    nb, n, cols = x.shape
    run = _build_r2c_dense_mid(n, nb, cols, str(x.dtype),
                               bool(config.pallas_interpret), dot_mode(),
                               tcfg=int(config.pallas_tile))
    return run(x)


def c2r_dense_pallas_mid(sr, si, n: int, scale=None):
    nb, _m, cols = sr.shape
    run = _build_c2r_dense_mid(n, nb, cols, str(sr.dtype),
                               bool(config.pallas_interpret), dot_mode(),
                               float(1.0 if scale is None else scale),
                               tcfg=int(config.pallas_tile))
    return run(sr, si)


# --------------------------------------------------------------------------
# Fused spectral pipeline: r2c -> diagonal multiply -> c2r in ONE kernel.
#
# The canonical real spectral step — filter / derivative / 1-D Poisson —
# is ndifft_r2c(H * ndfft_r2c(x)): two kernel passes plus a full HBM
# round-trip of the spectrum (write 2m + read 2m floats per lane). Here
# the spectrum never leaves VMEM: the forward combine, the diagonal
# multiply by H[k] and the inverse combine all run between the two
# half-FFT cores, so HBM traffic drops to read-n + write-n — the same
# real->real same-shape signature as the C2C kernels, which also makes
# the pipeline donate_io-eligible (in-place pages under chaining; the
# separate r2c/c2r kernels never can be: their shapes change n <-> m).
#
# H is an OPERAND (shape (m,) complex, split re/im host-side), not a
# constant — users re-filter without recompiling. Reference scope: the
# reference has no fused analog (each transform is a separate call,
# src/lib.rs:169-238); this is a TPU-native extension in the spirit of
# its examples' filter pipelines.
# --------------------------------------------------------------------------


def _spectral_kernel_mid(core, m_, f_, mode, h, ncf,
                         x_ref, hr_ref, hi_ref, *refs):
    """Block (1, n, TL) real -> (1, n, TL) real = c2r(H * r2c(x)).

    ``ncf`` = number of forward-core consts (the fwd/inv const split
    point). The r2c part mirrors _r2c_kernel_mid, the multiply applies
    the (m, 1) split-complex H rowwise, the c2r part mirrors
    _c2r_kernel_mid with the spectrum rows already in registers."""
    fwd_vals = [r[:] for r in refs[:ncf]]
    ur = refs[ncf][:]                        # (h, 1) pack twiddle
    ui = refs[ncf + 1][:]
    inv_vals = [r[:] for r in refs[ncf + 2:-7]]
    ar, ai = refs[-7][:], refs[-6][:]        # (h, 1), scale-folded
    cr_, ci_ = refs[-5][:], refs[-4][:]
    b0 = refs[-3][:]                         # (2, 1)
    mk = refs[-2][:]                         # (h, 1) DC-imag mask
    o_ref = refs[-1]
    tl = x_ref.shape[-1]
    # ---- forward r2c (see _r2c_kernel_mid) ----
    xt = x_ref[:].reshape(h, 2, tl)          # free even/odd de-interleave
    xe = xt[:, 0, :]
    xo = xt[:, 1, :]
    wr = jnp.concatenate([xe, xe], axis=1)   # columns [z | conj(z)]
    wi = jnp.concatenate([xo, -xo], axis=1)
    yr, yi = _nlead_core(core, wr, wi, fwd_vals, m_, f_, mode, -1)
    zr, zi = yr[:, :tl], yi[:, :tl]
    c_r, c_i = yr[:, tl:], yi[:, tl:]
    fer = 0.5 * (zr + c_r)
    fei = 0.5 * (zi + c_i)
    for_ = 0.5 * (zi - c_i)
    foi = -0.5 * (zr - c_r)
    xr = fer + for_ * ur - foi * ui          # spectrum rows 0..h-1
    xi = fei + for_ * ui + foi * ur
    last = zr[:1, :] - zi[:1, :]             # Nyquist re (imag exactly 0)
    # ---- diagonal multiply: S = H * X ----
    hr = hr_ref[:]                           # (m, 1) = (h+1, 1)
    hi = hi_ref[:]
    skr = hr[:h, :] * xr - hi[:h, :] * xi
    ski = hr[:h, :] * xi + hi[:h, :] * xr
    snr = hr[h:, :] * last                   # Re(S[h]); Im is masked by the
    #                                          c2r contract (never read)
    # ---- inverse c2r (see _c2r_kernel_mid) ----
    ski = ski * mk                           # DC imag forced 0
    pr = ar * skr - ai * ski
    pi = ar * ski + ai * skr
    qr = cr_ * skr + ci_ * ski
    qi = ci_ * skr - cr_ * ski
    q0r = qr[:1, :] + b0[:1, :] * snr
    q0i = qi[:1, :] + b0[1:, :] * snr
    qr = jnp.concatenate([q0r, qr[1:, :]], axis=0)
    qi = jnp.concatenate([q0i, qi[1:, :]], axis=0)
    wr2 = jnp.concatenate([pr, qr], axis=1)  # columns [P | conj(Q)]
    wi2 = jnp.concatenate([pi, -qi], axis=1)
    yr2, yi2 = _nlead_core(core, wr2, wi2, inv_vals, m_, f_, mode, +1)
    ev = 2.0 * (yr2[:, :tl] + yr2[:, tl:])   # (h, TL)
    od = 2.0 * (yi2[:, :tl] - yi2[:, tl:])
    d = jnp.concatenate([ev.reshape(h, 1, tl), od.reshape(h, 1, tl)],
                        axis=1)
    o_ref[:] = d.reshape(1, 2 * h, tl)       # free interleave


@lru_cache(maxsize=256)
def _build_spectral_mid(n: int, nb: int, cols: int, dtype_str: str,
                        interpret: bool, mode: str, scale: float,
                        tcfg: int = 0, core: str = "bts2", msplit: int = 0,
                        donate: bool = False, h_cols: int = 1):
    """(B, n, L) real + split H -> (B, n, L) real, axis 1.

    ``h_cols``: lane extent of H — 1 for a (m,) broadcast multiplier
    (zero extra HBM traffic) or ``cols`` for a LANE-VARYING (m, L)
    multiplier (the 2-D Poisson / full-field filter case: H streams one
    (m, tile) block per grid step, ~a quarter of the saved spectrum
    round-trip). The kernel body is unchanged — rows broadcast either
    way. ``scale`` is the TOTAL scalar (forward handler scalar x inverse
    normalization), folded into the c2r combine constants as usual.
    ``donate`` aliases the output onto the x operand (same shape)."""
    from .fft import _donate_kw

    h = n // 2
    m = h + 1
    dtype = jnp.dtype(dtype_str)
    m_, f_ = _nat_ts(h, msplit)
    fwd, _ = _nlead_consts(h, -1, dtype, mode, body=core, m_pref=msplit)
    ncf = len(fwd)
    k = np.arange(h, dtype=np.int64)
    ur, ui = _cis(2 * k, n, -1)
    fwd = fwd + [np.asarray(ur, dtype).reshape(h, 1),
                 np.asarray(ui, dtype).reshape(h, 1)]
    inv, _ = _nlead_consts(h, +1, dtype, mode, body=core, m_pref=msplit)
    vr, vi = _cis(2 * k, n, +1)
    a_r, a_i = 0.5 * (1.0 - vi), 0.5 * vr
    b_r, b_i = 0.5 * (1.0 + vi), -0.5 * vr
    idx = (-k) % h
    c_r, c_i = b_r[idx].copy(), b_i[idx].copy()
    c_r[0] = 0.0
    c_i[0] = 0.0
    mk = np.ones((h, 1), np.float64)
    mk[0, 0] = 0.0
    consts = fwd + inv + [
        np.asarray(a_r * scale, dtype).reshape(h, 1),
        np.asarray(a_i * scale, dtype).reshape(h, 1),
        np.asarray(c_r * scale, dtype).reshape(h, 1),
        np.asarray(c_i * scale, dtype).reshape(h, 1),
        np.asarray([[b_r[0] * scale], [b_i[0] * scale]], dtype),
        np.asarray(mk, dtype),
    ]
    tile = _mid_tile(cols, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    io_spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                           memory_space=pltpu.VMEM)
    h_spec = (pl.BlockSpec((m, 1), lambda g: (0, 0),
                           memory_space=pltpu.VMEM) if h_cols == 1 else
              pl.BlockSpec((m, tile), lambda g: (0, g % gc),
                           memory_space=pltpu.VMEM))
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_spectral_kernel_mid, core, m_, f_, mode, h, ncf),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[io_spec, h_spec, h_spec] + const_specs,
        out_specs=io_spec,
        cost_estimate=pl.CostEstimate(
            flops=int(20 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, 1),
    )
    return lambda x, hr, hi: call(x, hr, hi, *consts)


def spectral_pallas_mid(x, hr, hi, n: int, scale=None):
    """(B, n, L) real, (m, 1) or (m, L) split H -> (B, n, L) real, axis 1."""
    nb, _n, cols = x.shape
    run = _build_spectral_mid(n, nb, cols, str(x.dtype),
                              bool(config.pallas_interpret), dot_mode(),
                              float(1.0 if scale is None else scale),
                              tcfg=int(config.pallas_tile),
                              core=mid_core_body(),
                              msplit=_rfft_msplit(n // 2),
                              donate=bool(config.donate_io),
                              h_cols=int(hr.shape[-1]))
    return run(x, hr, hi)
