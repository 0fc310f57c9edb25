"""Fused Pallas TPU kernels for batched C2C FFT — Mosaic-native design.

This is the TPU-native replacement for rustfft's butterfly kernels
(SURVEY.md §2.2 N1): the whole mixed-radix schedule for one tile of lanes
runs in VMEM — every element is read from HBM once and written once, instead
of round-tripping per stage as a pure-XLA lowering does.

Mosaic (the Pallas TPU compiler) does not allow reshapes that split the lane
(minor-most) dimension, so the schedule is laid out around that constraint
(validated empirically via compile-only probes on the real toolchain):

* axis-0 flavor (transform on the major axis): input (n, L) is pre-reshaped
  to (m, f, L) by XLA (free); ALL FFT stages run on leading/middle dims
  (middle-dim splits + leading-output dot_generals -> MXU, broadcast
  twiddles -> VPU) while the lane axis carries pure batch — no lane
  relayouts at all, the most TPU-natural layout. Output (f, m, L) -> (n, L):
  index k = q*m + p with q from the outer factor-f DFT.

* lane-last flavor (transform on the minor axis): blocks stay 2-D (tile, n)
  — perfect (8,128) layouts — and the tile is transposed ONCE in VMEM to
  (n, tile), leading-dim reshaped to (m, f, tile) (legal: only the lane dim
  may not be split) and run through the same axis-0 schedule, then merged
  and transposed back. Small-minor-dim 3-D blocks are a trap: Mosaic pads
  the minor dim to 128, inflating VMEM 32x (found empirically).

Split re/im float32 throughout (TPU has no complex registers). Complex
matmuls use the 3-multiplication form. Plans whose shapes don't fit
(Bluestein sizes, f64, n with no suitable lane factor) fall back to the XLA
engine.

STATUS (round 2, measured on v5e, tools/time_kernels.py; 1024^2 c64,
batch 16, us/transform):

  round-2 start (row-oriented twostep, external scale pass)    106.0
  + host-prebuilt K-stacked bf16 W consts (ks_w6_np)            85.2
  + fused scalar normalization (chain = kernel-only)            75.2
  + swapped stage-1 dot orientation (one relayout total)        59.8
  + VPU butterfly combine + 1-D grid (corrected chain)          59.0
  jnp.fft.ifft + the same (unfusable) scale, same chain        172

The boundary passes were the story: jnp.real/imag extraction and the
external normalization multiply cost more than the kernel math (see
NOTES_TPU.md round-2 attribution). Kernels are ON by default
(config.use_pallas); the recursive flavors remain for sizes without a
{128,256} split. Correctness is pinned in interpreter mode
(tests/test_pallas.py) and every flavor x dot mode is compile-verified
on the real toolchain by ops/pallas/probe.py (bench.py --compile-check).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from ...config import use_pallas_effective as _use_pallas
from ...config import matmul_precision as _cfg_precision
from ...plan import C2CPlan, chirp, dft_matrix, factorize, stage_twiddle


def dot_mode() -> str:
    """Kernel-side dot strategy for the configured precision.

    Mosaic rejects ``Precision.HIGH``, so the 'high' config is implemented
    MANUALLY as bf16x3: split each f32 operand into a bf16 hi + bf16 lo
    part and take three DEFAULT-precision bf16 dots with f32 accumulation
    (dropping the lo*lo term) — the exact arithmetic XLA's HIGH performs.
    This is 2x fewer MXU passes than the round-1 clamp to HIGHEST (6-pass).
    """
    p = _cfg_precision()
    if p == jax.lax.Precision.HIGH:
        return "bf16x3"
    if p == jax.lax.Precision.HIGHEST:
        return "highest"
    return "default"


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dg(w, x, dims, mode):
    """dot_general(w, x, dims) under the kernel dot strategy; f32 output."""
    if mode == "bf16x3":
        whi, wlo = _bf16_split(w)
        xhi, xlo = _bf16_split(x)

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)

        return d(whi, xhi) + d(whi, xlo) + d(wlo, xhi)
    prec = (jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(w, x, dims, precision=prec,
                               preferred_element_type=jnp.float32)

def ks_w6_np(wr, wi):
    """Build-time K-stacked bf16 W for the bf16x3 complex dot (numpy).

    Rebuilding this matrix from the f32 (wr, wi) refs INSIDE the kernel
    costs 8 bf16 splits + 3 concats per grid step; hoisting it to a numpy
    constant removes that work and halves the const DMA (bf16 vs f32)."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    wr = np.asarray(wr, np.float32)
    wi = np.asarray(wi, np.float32)
    whr = wr.astype(bf)
    wlr = (wr - whr.astype(np.float32)).astype(bf)
    whi = wi.astype(bf)
    wli = (wi - whi.astype(np.float32)).astype(bf)
    w_re = np.concatenate([whr, whr, wlr, -whi, -whi, -wli], axis=0)
    w_im = np.concatenate([whi, whi, wli, whr, whr, wlr], axis=0)
    return np.concatenate([w_re, w_im], axis=1)      # (6t, 2p) bf16


def ks_w6_re_np(wr, wi):
    """Real-output-rows-only variant of :func:`ks_w6_np`: (6t, p) bf16.

    Computes only Re(w^T x) of the complex contraction — used by stages
    whose imaginary output is discarded (DCT-III's combine), halving the
    stage's MXU work."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    wr = np.asarray(wr, np.float32)
    wi = np.asarray(wi, np.float32)
    whr = wr.astype(bf)
    wlr = (wr - whr.astype(np.float32)).astype(bf)
    whi = wi.astype(bf)
    wli = (wi - whi.astype(np.float32)).astype(bf)
    return np.concatenate([whr, whr, wlr, -whi, -whi, -wli], axis=0)


def _ks_complex_dot(xr, xi, wr, wi, mode, w6=None, re_only=False):
    """Complex contraction out[p, N] = sum_t w[t, p] * x[t, N] on split
    re/im f32 values, as ONE K-stacked MXU dot in bf16x3 mode.

    The manual 3-pass form (three DEFAULT dots + f32 adds per real
    contraction; 9 dot instances per complex contraction in the 3M form)
    measured ~20% MXU efficiency — per-dot staging dominates. Instead every
    bf16x3 term of the 4M complex form is a K-block of a single deep dot:

        X6 = [xr_hi; xr_lo; xr_hi; xi_hi; xi_lo; xi_hi]      (6t, N)
        W  = [[wr_hi, wr_hi, wr_lo, -wi_hi, -wi_hi, -wi_lo]   (6t, 2p)
              [wi_hi, wi_hi, wi_lo,  wr_hi,  wr_hi,  wr_lo]]  (M-stacked)
        out = W^T X6   ->  rows [re; im]

    Same arithmetic as bf16x3 (the lo*lo term dropped, f32 accumulation),
    33% more MACs than 3M (4m vs 3m per element) but ONE dot instance with
    K = 6t and M = 2p — the MXU-efficient shape. Non-bf16x3 modes fall back
    to the 3M three-dot form. Pass ``w6`` (from :func:`ks_w6_np`, or
    :func:`ks_w6_re_np` with ``re_only``) to skip the in-kernel W build;
    ``wr``/``wi`` may then be None. ``re_only`` computes just the real
    output rows.
    """
    if mode != "bf16x3":
        def con(x, w):
            return _dg(w, x, (((0,), (0,)), ((), ())), mode)

        if re_only:
            return con(xr, wr) - con(xi, wi), None
        return _cdot(xr, xi, wr, wi, con)
    xhr, xlr = _bf16_split(xr)
    xhi_, xli_ = _bf16_split(xi)
    x6 = jnp.concatenate([xhr, xlr, xhr, xhi_, xli_, xhi_], axis=0)
    if w6 is None:
        whr, wlr = _bf16_split(wr)
        whi, wli = _bf16_split(wi)
        w_re = jnp.concatenate([whr, whr, wlr, -whi, -whi, -wli], axis=0)
        if re_only:
            w6 = w_re
        else:
            w_im = jnp.concatenate([whi, whi, wli, whr, whr, wlr], axis=0)
            w6 = jnp.concatenate([w_re, w_im], axis=1)   # (6t, 2p)
    out = jax.lax.dot_general(w6, x6, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if re_only:
        return out, None
    p_out = out.shape[0] // 2
    return out[:p_out], out[p_out:]


def ks_w3_np(w):
    """Build-time (3t, P) bf16 K-stack of a real dot matrix ``w`` (t, P)
    for the bf16x3 real-operand dot (numpy; see ks_w6_np)."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    w = np.asarray(w, np.float32)
    hi = w.astype(bf)
    lo = (w - hi.astype(np.float32)).astype(bf)
    return np.concatenate([hi, hi, lo], axis=0)


def _ks_real_dot(x, wr, wi, mode, im_out=True, w3=None):
    """out[p, N] = sum_t w[t, p] * x[t, N] for REAL x and complex w, as one
    K-stacked dot in bf16x3 mode (3 K-blocks); used by the fused DCT
    kernels' first stage. With im_out=False only the real rows are
    computed. Pass ``w3`` (ks_w3_np of the column-stacked [wr | wi], or of
    wr alone when im_out=False) to skip the in-kernel W build."""
    if mode != "bf16x3":
        def con(v, w_):
            return _dg(w_, v, (((0,), (0,)), ((), ())), mode)

        t1 = con(x, wr)
        if not im_out:
            return t1, None
        return t1, con(x, wi)
    xh, xl = _bf16_split(x)
    x3 = jnp.concatenate([xh, xl, xh], axis=0)
    if w3 is None:
        whr, wlr = _bf16_split(wr)
        parts = [jnp.concatenate([whr, whr, wlr], axis=0)]
        if im_out:
            whi, wli = _bf16_split(wi)
            parts.append(jnp.concatenate([whi, whi, wli], axis=0))
        w3 = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    out = jax.lax.dot_general(w3, x3, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if not im_out:
        return out, None
    p_out = out.shape[0] // 2
    return out[:p_out], out[p_out:]


# per-tile VMEM working-set budget (bytes) and the Mosaic scoped-vmem limit
# requested via CompilerParams (see _build_call)
_VMEM_BUDGET = 8 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
_LIVE_COPIES = 8
_MAX_LANE_FACTOR = 256  # dense lane DFT cost: f MACs/element
_MAX_N = 65536


def _lane_tile(n: int, itemsize: int) -> int:
    """Largest power-of-two lane tile whose working set fits the budget."""
    t = 512
    while t > 8 and t * n * itemsize * _LIVE_COPIES > _VMEM_BUDGET:
        t //= 2
    return t


def _donate_kw(donate: bool, nplanes: int = 2):
    """pallas_call kwargs for config.donate_io: alias the first ``nplanes``
    data operands to the outputs (in-place HBM pages).

    Legal only when the output shapes equal the corresponding input shapes
    AND the in/out BlockSpecs use the same index map (every grid step then
    overwrites exactly the block it already consumed, so no other step can
    observe the write). Inside a lax.fori_loop/scan chain this lets XLA
    alias the loop carry through the kernel, deleting the hidden carry-copy
    HBM round trip (~2x on chained 1024^2 c64, tools/floor_sweep.py)."""
    if not donate:
        return {}
    return {"input_output_aliases": {i: i for i in range(nplanes)}}


def _lane_factor(n: int) -> Optional[int]:
    return _lane_factor_cached(n, config.max_base_radix)


@lru_cache(maxsize=None)
def _lane_factor_cached(n: int, _max_base: int) -> Optional[int]:
    """Pick the lane DFT factor f (m = n // f runs on sublane dims).

    Preference: f a multiple of 128 in [128, 256] (native lane width), then
    — for n > 1024 — any 8-aligned f in [64, 256] (a misaligned lane extent
    at large n is a measured Mosaic compile pathology: n=4374 with f=243
    took 781 s to compile vs 21-44 s for f=216 neighbors, BASELINE.md),
    then any f in [64, 256], then the largest divisor ≤ 256. The remaining
    m must be fully factorable by the planner.
    """
    divs = [d for d in range(1, min(n, _MAX_LANE_FACTOR) + 1) if n % d == 0]
    if n <= _MAX_LANE_FACTOR:
        return n
    preds = [lambda d: d % 128 == 0 and d >= 128]
    if n > 1024:
        preds.append(lambda d: d % 8 == 0 and d >= 64)
    preds += [lambda d: d >= 64, lambda d: d > 1]
    for pred in preds:
        cands = [d for d in divs if pred(d)]
        for f in sorted(cands, reverse=True):
            if factorize(n // f) is not None:
                return f
    return None


def pallas_supported(plan: C2CPlan, dtype) -> bool:
    if not _use_pallas():
        return False
    if plan.kind != "ct":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if plan.n < 2 or plan.n > _MAX_N:
        return False
    # tiles are forced to >=128 wide (narrow tiles hit Mosaic shape-cast
    # limits), so the working set at tile=128 must fit the kernel VMEM limit
    if _LIVE_COPIES * 128 * plan.n * jnp.dtype(dtype).itemsize > int(
            0.8 * _VMEM_LIMIT):
        return False
    f = _lane_factor(plan.n)
    if f is None:
        return False
    if plan.n > 1024 and f % 8 != 0:
        # no 8-aligned lane factor exists (e.g. n = 2 * 3^k): the generic
        # body's misaligned-lane relayouts are a measured Mosaic
        # compile-time pathology (781 s at n=4374) — the einsum engine is
        # the better citizen for these rare shapes
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


# --------------------------------------------------------------------------
# Mosaic schedule: constants + in-kernel math
# --------------------------------------------------------------------------


def _cdot(ar, ai, br, bi, contract):
    """Complex contraction via 3 real contractions (3M form)."""
    t1 = contract(ar, br)
    t2 = contract(ai, bi)
    t3 = contract(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _mid_stages(m: int, sign: int, dtype):
    """Sublane-FFT schedule for length m: [(g, rem)] + dense base consts.

    DIT along a middle axis: t = g*t' + j splits the axis (middle reshape,
    Mosaic-legal); twiddles are stored pre-transposed (rem, g) to broadcast
    onto the (.., p, j, ..) value layout.
    """
    factors = factorize(m)
    assert factors is not None
    stages = []
    rem = m
    for g in factors[:-1]:
        rem //= g
        wr, wi = dft_matrix(g, sign)
        tr, ti = stage_twiddle(g, rem, sign)
        stages.append((g, rem,
                       (np.asarray(wr, dtype), np.asarray(wi, dtype)),
                       (np.asarray(tr.T, dtype), np.asarray(ti.T, dtype))))
    br, bi = dft_matrix(factors[-1], sign)
    base = (np.asarray(br, dtype), np.asarray(bi, dtype))
    return stages, base


def _con_mid(w, x, contract_axis, place_axis, mode):
    """Contract x's dim `contract_axis` with w's dim 0; put w's dim 1 at
    `place_axis`.

    dot_general with the contraction OUTPUT leading compiles fast under
    Mosaic (batched small einsums like 'tp,btf->bpf' blow the compiler up
    for large batch tiles — found empirically); the fix-up permute only
    moves LEADING dims, never the lane, which is a cheap relayout.
    """
    y = _dg(w, x, (((0,), (contract_axis,)), ((), ())), mode)
    if place_axis == 0:
        return y
    perm = tuple(range(1, place_axis + 1)) + (0,) + tuple(
        range(place_axis + 1, x.ndim))
    return jnp.transpose(y, perm)


def _fft_mid(xr, xi, axis, stages, base, mode):
    """FFT along a middle axis `axis`; all other dims are batch.

    Every op is Mosaic-legal: middle-dim reshapes, leading-output
    dot_generals, broadcast multiplies, middle-dim merges.

    DIT at each level: t = g*t' + j;
      X[q*rem + p] = sum_j W_g^{jq} * W_{g*rem}^{jp} * FFT_rem(x[j::g])[p]
    """
    if not stages:
        def con(x, w):
            return _con_mid(w, x, axis, axis, mode)

        return _cdot(xr, xi, base[0], base[1], con)

    g, rem, (wr, wi), (twr, twi) = stages[0]
    shape = xr.shape
    split = shape[:axis] + (rem, g) + shape[axis + 1:]
    yr, yi = _fft_mid(xr.reshape(split), xi.reshape(split),
                      axis, stages[1:], base, mode)      # (.., p, j, ..)
    bshape = (1,) * axis + (rem, g) + (1,) * (len(shape) - axis - 1)
    tr = twr.reshape(bshape)   # pre-transposed (rem, g) = tw[p, j]
    ti = twi.reshape(bshape)
    yr, yi = yr * tr - yi * ti, yr * ti + yi * tr

    # combine over j at axis+1, landing q at axis:
    #   out[.., q, p, ..] = sum_j wf[j, q] y[.., p, j, ..]
    def con(x, w):
        return _con_mid(w, x, axis + 1, axis, mode)

    or_, oi = _cdot(yr, yi, wr, wi, con)
    merged = shape[:axis] + (g * rem,) + shape[axis + 1:]
    return or_.reshape(merged), oi.reshape(merged)


def _plan_consts(n: int, sign: int, dtype, scale: float = 1.0):
    """(f, m, mid-stage consts, lane DFT, outer twiddle^T) for the kernel.

    ``scale`` is folded into the lane-DFT constant (every element passes the
    final lane combine exactly once), so a scalar normalization costs zero
    kernel work — the fused-norm path (reference src/lib.rs:333-338 applies
    its 1/n inside the lane pass the same way).

    Split preference (measured on v5e): a single DENSE MXU-width sub-factor
    m in {128, 256} with a small combine factor f = n/m minimizes both the
    MACs/element (m + f) and the number of relayouts — n=1024 as (m=128,
    f=8) costs 136 MACs/elt vs 260 for the round-1 (f=256, m=4) choice and
    ran ~2x faster in the axis-mid kernel. Sizes without such a divisor
    fall back to the lane-factor heuristic.
    """
    ts = _twostep_split(n)
    if (n > _MAX_LANE_FACTOR and ts is not None
            and ts[0] <= config.max_base_radix):
        m, f = ts
    else:
        f = _lane_factor(n)
        m = n // f
    wr, wi = dft_matrix(f, sign)
    lane = (np.asarray(wr * scale, dtype), np.asarray(wi * scale, dtype))
    if m == 1:
        return f, 1, ([], None), lane, None
    stages, base = _mid_stages(m, sign, dtype)
    tr, ti = stage_twiddle(f, m, sign)  # (f, m)[j, p]
    tw = (np.asarray(tr.T, dtype), np.asarray(ti.T, dtype))  # (m, f)[p, j]
    return f, m, (stages, base), lane, tw


def _flat_consts(mid, lane, tw):
    stages, base = mid
    flat, struct = [], []
    for g, rem, w, t in stages:
        flat += [w[0], w[1], t[0], t[1]]
        struct.append((g, rem))
    if base is not None:
        flat += [base[0], base[1]]
    flat += [lane[0], lane[1]]
    if tw is not None:
        flat += [tw[0], tw[1]]
    return flat, tuple(struct), base is not None, tw is not None


def _unflat(refs, struct, has_base, has_tw):
    vals = [r[:] for r in refs]
    i = 0
    stages = []
    for g, rem in struct:
        stages.append((g, rem, (vals[i], vals[i + 1]),
                       (vals[i + 2], vals[i + 3])))
        i += 4
    base = None
    if has_base:
        base = (vals[i], vals[i + 1])
        i += 2
    lane = (vals[i], vals[i + 1])
    i += 2
    tw = None
    if has_tw:
        tw = (vals[i], vals[i + 1])
    return stages, base, lane, tw


def _axis0_core(xr, xi, stages, base, lane, tw, m, f, mode):
    """Shared schedule on (m, f, L) values -> (f, m, L): the transform runs
    entirely on leading dims; the minor (lane) axis is pure batch. This is
    the Mosaic-friendliest orientation: no small-lane padding, no lane
    relayouts."""
    yr, yi = _fft_mid(xr, xi, 0, stages, base, mode)      # (p, j, L)
    twr = tw[0][:, :, None]                                # (m, f, 1)
    twi = tw[1][:, :, None]
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr

    # combine over j (dim 1), q lands at dim 0: out[q, p, l]
    def con(x, w):
        return _con_mid(w, x, 1, 0, mode)

    return _cdot(yr, yi, lane[0], lane[1], con)      # (q, p, L)


def _lane_last_math(xr, xi, stages, base, lane, tw, m, f, mode):
    """In-kernel lane-last FFT math on (T, n) values -> (T, n).

    For m == 1 this is a single dense lane matmul. Otherwise the tile is
    transposed once in VMEM to (n, T), leading-dim reshaped to (m, f, T)
    (legal — only the lane dim may not be split), run through the axis-0
    schedule, merged back to (n, T) and transposed out. 2-D (tile, n)
    blocks keep perfect (8,128) layouts; small-minor-dim 3-D blocks padded
    32x the logical size and blew the VMEM budget (found empirically).

    Shared by the C2C lane-last kernel and the fused R2C/C2R kernels
    (rfft.py), which run it on a 2T-row batch."""
    if m == 1:
        def con(x, w):
            return _dg(x, w, (((x.ndim - 1,), (0,)), ((), ())), mode)

        return _cdot(xr, xi, lane[0], lane[1], con)
    t = xr.shape[0]
    n = m * f
    xr = xr.T.reshape(m, f, t)
    xi = xi.T.reshape(m, f, t)
    zr, zi = _axis0_core(xr, xi, stages, base, lane, tw, m, f, mode)
    return zr.reshape(n, t).T, zi.reshape(n, t).T


def _kernel_lane_last(struct, has_base, has_tw, m, f, mode,
                      xr_ref, xi_ref, *refs):
    """x block (T, n) -> out block (T, n), transform along lanes."""
    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages, base, lane, tw = _unflat(const_refs, struct, has_base, has_tw)
    yr, yi = _lane_last_math(xr_ref[:], xi_ref[:], stages, base, lane, tw,
                             m, f, mode)
    or_ref[:] = yr
    oi_ref[:] = yi


def _kernel_axis0(struct, has_base, has_tw, m, f, mode,
                  xr_ref, xi_ref, *refs):
    """x block (m, f, TL) -> out block (f, m, TL)."""
    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages, base, lane, tw = _unflat(const_refs, struct, has_base, has_tw)
    xr, xi = xr_ref[:], xi_ref[:]
    if m == 1:
        # dense DFT over the length-f dim of the (1, f, TL) block
        def con3(x, w):
            return _con_mid(w, x, 1, 1, mode)

        yr, yi = _cdot(xr, xi, lane[0], lane[1], con3)
        or_ref[:] = jnp.swapaxes(yr, 0, 1)     # (f, 1, TL): k = q
        oi_ref[:] = jnp.swapaxes(yi, 0, 1)
        return
    zr, zi = _axis0_core(xr, xi, stages, base, lane, tw, m, f, mode)
    or_ref[:] = zr
    oi_ref[:] = zi


@lru_cache(maxsize=256)
def _build_call(n: int, sign: int, batch: int, dtype_str: str,
                interpret: bool, mode: str, scale: float = 1.0,
                donate: bool = False):
    """Lane-last flavor: (B, n) re/im -> (B, n) re/im."""
    dtype = jnp.dtype(dtype_str)
    f, m, mid, lane, tw = _plan_consts(n, sign, dtype, scale)
    consts, struct, has_base, has_tw = _flat_consts(mid, lane, tw)
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)  # <128-wide tiles hit Mosaic shape-cast limits
    grid = (pl.cdiv(batch, tile),)
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    flops = 10.0 * n * np.log2(max(n, 2)) * batch
    call = pl.pallas_call(
        partial(_kernel_lane_last, struct, has_base, has_tw, m, f, mode),
        out_shape=(jax.ShapeDtypeStruct((batch, n), dtype),
                   jax.ShapeDtypeStruct((batch, n), dtype)),
        grid=grid,
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(4 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate),
    )

    def run(xr, xi):
        return call(xr, xi, *consts)

    return run


@lru_cache(maxsize=256)
def _build_call_axis0(n: int, sign: int, cols: int, dtype_str: str,
                      interpret: bool, mode: str, scale: float = 1.0):
    """Axis-0 flavor: (n, L) re/im -> (n, L) re/im, zero lane relayouts."""
    dtype = jnp.dtype(dtype_str)
    f, m, mid, lane, tw = _plan_consts(n, sign, dtype, scale)
    consts, struct, has_base, has_tw = _flat_consts(mid, lane, tw)
    # lane (minor) dim of the 3-D blocks: must be a multiple of 128 or equal
    # to the whole cols extent (Mosaic block-shape constraint)
    if cols <= 128:
        tile = cols
    else:
        tile = max(128, min(_lane_tile(n, dtype.itemsize), 512) // 128 * 128)
        tile = min(tile, -(-cols // 128) * 128)  # no padded-lane overhang
    grid = (pl.cdiv(cols, tile),)
    in_spec = pl.BlockSpec((m, f, tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((f, m, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    flops = 10.0 * n * np.log2(max(n, 2)) * cols
    call = pl.pallas_call(
        partial(_kernel_axis0, struct, has_base, has_tw, m, f, mode),
        out_shape=(jax.ShapeDtypeStruct((f, m, cols), dtype),
                   jax.ShapeDtypeStruct((f, m, cols), dtype)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(4 * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def run(xr, xi):
        xr = xr.reshape(m, f, cols)
        xi = xi.reshape(m, f, cols)
        yr, yi = call(xr, xi, *consts)
        return yr.reshape(n, cols), yi.reshape(n, cols)

    return run


# --------------------------------------------------------------------------
# Two-step flavor ("twostep"): every heavy op is a plain 2-D matmul or a
# leading-split dot, and no intermediate carries a narrow (<128) lane dim —
# the two Mosaic codegen traps measured on v5e. Dataflow for one (T, n) tile,
# n = m * f with the SUBLANE DFT factor m >= 128 and the residue factor
# f = n/m <= 256 (t = f*t' + j):
#
#   (T, n) --transpose--> (n, T) --reshape--> (m, f*T)          [lane >= 128]
#   S1 = Wm^T . x          : contract m, leading-output         [MXU 2-D]
#   S1 *= TW[p, (j,t)]      : precomputed (m, f*T) constant     [VPU]
#   --transpose--> (f*T, m) --reshape--> (f, T, m)              [lane = m]
#   Z = Wf^T . y            : contract f, leading-output        [MXU]
#   (q, T, m) --perm--> (T, q, m) --lane-merge--> (T, n)        [k = q*m + p]
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _twostep_split(n: int, m_pref: int = 0):
    """(m, f) with m in [128, 256] dividing n and f = n/m <= 256, or None.

    m must be a multiple of 128: other sublane extents hit Mosaic's
    unsupported-shape-cast on the (n, T) -> (m, f*T) view (m=132 measured to
    fail); among {128, 256} prefer minimal m + f (dense MACs/element).
    ``m_pref`` forces a specific m when it divides n (perf experiments,
    config.mid_split).

    ``m_pref = 64`` is additionally honored (round 5): the stage-2 dense
    DFT-m dot is the kernels' dominant MXU cost (6m^2 f L MACs/tile scales
    linearly with m), and m=64 keeps every MXU-relevant extent tile-clean
    (K-stack 3m=192 / 6m=384, output 2m=128 = exactly one lane tile; only
    the f-butterfly's per-plane lane width drops to 64 on the TS body).
    64 is never picked automatically — it must win an on-chip A/B first
    (config.dct_split / config.rfft_split / config.mid_split)."""
    cands = [d for d in (64, 128, 256)
             if n % d == 0 and n // d <= (256 if d >= 128 else 16)]
    if m_pref in cands:
        return m_pref, n // m_pref
    cands = [d for d in cands if d >= 128]
    if not cands:
        return None
    m = min(cands, key=lambda d: d + n // d)
    return m, n // m


def _twostep_math(xr, xi, consts, m, f, rows, mode, sign=None):
    """(rows, n) complex pair -> (rows, n) via the twostep dataflow on
    ROW-oriented tiles; shared by the lane-last C2C twostep kernel and the
    packed R2C kernel (rfft.py).

    Stage 1 runs in the SWAPPED orientation after the entry transpose
    (out (f*T, 2p) = dot_general(x6, w6)) so the mid lane<->sublane
    transpose of the original form disappears; the f-combine uses VPU
    butterflies for tiny power-of-two f when ``sign`` is known (see
    _ts_core_nlead / _combine_f).
    """
    n = m * f
    if len(consts) == 4:
        w6m, tws_r, tws_i, w6f = consts
        wm = (None, None)
        wf_arg = w6f
    else:
        (wm_r, wm_i, tws_r, tws_i, wf_r, wf_i) = consts
        w6m = None
        wm = (wm_r, wm_i)
        wf_arg = (wf_r, wf_i)
    # x2: (m, f*T)   ->  stage 1 swapped: out ((j,t), 2p)
    xr2 = xr.T.reshape(m, f * rows)
    xi2 = xi.T.reshape(m, f * rows)
    yr, yi = _ks_complex_dot_swapped(xr2, xi2, wm[0], wm[1], mode, w6=w6m)
    yr = yr.reshape(f, rows, m)                      # (j, t, p)
    yi = yi.reshape(f, rows, m)
    twr = tws_r.T.reshape(f, 1, m)
    twi = tws_i.T.reshape(f, 1, m)
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
    zr, zi = _combine_f(yr, yi, wf_arg, f, mode, sign)           # (q, t, p)
    zr = jnp.transpose(zr, (1, 0, 2)).reshape(rows, n)
    zi = jnp.transpose(zi, (1, 0, 2)).reshape(rows, n)
    return zr, zi


def _twostep_consts(n: int, sign: int, dtype, mode: str = "default",
                    scale: float = 1.0, m_pref: int = 0):
    """Twostep kernel consts + (m, f).

    bf16x3 mode: [W6_m (bf16), tw_r (m,f), tw_i, W6_f (bf16)] with the
    K-stacked dot matrices prebuilt host-side (ks_w6_np). Other modes:
    [wm_r, wm_i, tw_r, tw_i, wf_r, wf_i] f32 pairs. ``scale`` is folded
    into the stage twiddle (every element passes it once) — the fused
    scalar-normalization path, costing zero kernel work."""
    m, f = _twostep_split(n, m_pref)
    wm = dft_matrix(m, sign)
    wf = dft_matrix(f, sign)
    twi_ = stage_twiddle(f, m, sign)  # (f, m)[j, p]
    tws = [np.asarray(twi_[0].T * scale, dtype).copy(),      # (m, f)
           np.asarray(twi_[1].T * scale, dtype).copy()]
    if mode == "bf16x3":
        consts = [ks_w6_np(wm[0], wm[1])] + tws + [ks_w6_np(wf[0], wf[1])]
    else:
        consts = [np.asarray(wm[0], dtype), np.asarray(wm[1], dtype)] + tws \
            + [np.asarray(wf[0], dtype), np.asarray(wf[1], dtype)]
    return consts, (m, f)


def _kernel_twostep(m, f, tile, mode, sign, xr_ref, xi_ref, *refs):
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    or_ref[:], oi_ref[:] = _twostep_math(xr_ref[:], xi_ref[:], consts,
                                         m, f, tile, mode, sign)


@lru_cache(maxsize=256)
def _build_call_twostep(n: int, sign: int, batch: int, dtype_str: str,
                        interpret: bool, mode: str, scale: float = 1.0,
                        tcfg: int = 0, donate: bool = False):
    dtype = jnp.dtype(dtype_str)
    consts, (m, f) = _twostep_consts(n, sign, dtype, mode, scale)
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    if batch >= 128:
        tile = max(tile, 128)
    if tcfg:
        tile = min(max(8, batch), tcfg)
    grid = (pl.cdiv(batch, tile),)
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_kernel_twostep, m, f, tile, mode, sign),
        out_shape=(jax.ShapeDtypeStruct((batch, n), dtype),
                   jax.ShapeDtypeStruct((batch, n), dtype)),
        grid=grid,
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n * np.log2(max(n, 2)) * batch),
            bytes_accessed=int(4 * batch * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate),
    )

    def run(xr, xi):
        return call(xr, xi, *consts)

    return run


def _ks_complex_dot_swapped(xr, xi, wr, wi, mode, w6=None):
    """Complex contraction with the OUTPUT's non-contracted dims LEADING:
    out (N, 2p) = dot_general(x6, w6) instead of (2p, N).

    Same arithmetic as :func:`_ks_complex_dot` (same w6 constant), but the
    swapped orientation leaves the result already (j, l)-leading, deleting
    the downstream lane<->sublane transpose — measured faster on v5e (the
    MXU's native dataflow is stationary-W, streamed-x rows)."""
    if mode != "bf16x3":
        def con(a, b):
            return _dg_sw(a, b, mode)

        return _cdot(xr, xi, wr, wi, con)
    xhr, xlr = _bf16_split(xr)
    xhi_, xli_ = _bf16_split(xi)
    x6 = jnp.concatenate([xhr, xlr, xhr, xhi_, xli_, xhi_], axis=0)
    if w6 is None:
        whr, wlr = _bf16_split(wr)
        whi, wli = _bf16_split(wi)
        w_re = jnp.concatenate([whr, whr, wlr, -whi, -whi, -wli], axis=0)
        w_im = jnp.concatenate([whi, whi, wli, whr, whr, wlr], axis=0)
        w6 = jnp.concatenate([w_re, w_im], axis=1)
    out = jax.lax.dot_general(x6, w6, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    p_out = out.shape[-1] // 2
    return out[..., :p_out], out[..., p_out:]


def _dg_sw(x, w, mode):
    """dot_general(x, w) contracting both dim-0s; f32 out (N, P)."""
    prec = (jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(x, w, (((0,), (0,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)


_BFLY_F = (2, 4, 8, 16)


def bfly_dft_leading(planes, sign):
    """f-point DFT over the leading dim, as radix-2 DIF butterflies on the
    VPU; ``planes`` is a list of f (re, im) array pairs, output in NATURAL
    order (X[2q] = DFT(top)[q], X[2q+1] = DFT(bot)[q], recursively).

    For tiny f the MXU stage-2 dot wastes >90% of the systolic array
    (M = 2f, K = 6f vs the 128^3 tile) — these adds measured ~8% faster
    end-to-end at f=8 on v5e. Twiddles are python scalars; multiplies by
    ±1/±i reduce to sign flips and re/im swaps.

    A plane may be ``None`` meaning an exact-zero plane (the Bluestein
    pow2 pad): butterflies against a zero plane degenerate to copies /
    twiddled copies at trace time — roughly a free first DIF level when
    the upper half of the input is padding.
    """
    import math

    f = len(planes)
    if f == 1:
        return planes
    h = f // 2
    tops, bots = [], []
    for k in range(h):
        a = planes[k]
        b = planes[k + h]
        if a is None and b is None:
            tops.append(None)
            bots.append(None)
            continue
        if b is None:
            ar, ai = a
            tops.append(a)
            dr, di = ar, ai
        elif a is None:
            br, bi = b
            tops.append(b)
            dr, di = -br, -bi
        else:
            ar, ai = a
            br, bi = b
            tops.append((ar + br, ai + bi))
            dr, di = ar - br, ai - bi
        wr_ = math.cos(2 * math.pi * k / f)
        wi_ = math.sin(2 * math.pi * k / f) * (1.0 if sign > 0 else -1.0)
        if k == 0:
            bots.append((dr, di))
        elif abs(wr_) < 1e-12:      # *(0, +-1): re/im swap + sign
            bots.append((-di * wi_, dr * wi_))
        else:
            bots.append((dr * wr_ - di * wi_, dr * wi_ + di * wr_))
    e = bfly_dft_leading(tops, sign)
    o = bfly_dft_leading(bots, sign)
    out = []
    for q in range(h):
        out.append(e[q])
        out.append(o[q])
    return out


def _combine_f(yr, yi, consts_wf, f, mode, sign):
    """Stage-2 combine over the leading f dim of (f, C, m) pairs ->
    (f, C, m) in natural q order: VPU butterflies for tiny power-of-two f,
    the K-stacked MXU dot otherwise."""
    if f in _BFLY_F and sign is not None:
        planes = [(yr[k], yi[k]) for k in range(f)]
        z = bfly_dft_leading(planes, sign)
        zr = jnp.concatenate([p[0][None] for p in z], axis=0)
        zi = jnp.concatenate([p[1][None] for p in z], axis=0)
        return zr, zi
    w6f_or_pair = consts_wf
    if isinstance(w6f_or_pair, tuple):
        return _ks_complex_dot(yr, yi, w6f_or_pair[0], w6f_or_pair[1], mode)
    return _ks_complex_dot(yr, yi, None, None, mode, w6=w6f_or_pair)


def _ts_core_nlead(xr, xi, consts, m, f, cols, mode, sign=None):
    """Twostep core on n-LEADING (n, C) split re/im pairs -> (n, C).

    The all-2-D-matmul dataflow with ONE relayout total (the intrinsic
    exit swap): the caller's layout already has the transform dim leading,
    so (n, C) -> (m, f*C) is a pure reshape, and stage 1 runs in the
    SWAPPED orientation (out (f*C, 2p) = dot_general(x6, w6)) so its
    output is already (j, l)-leading — the mid lane<->sublane transpose of
    the row-oriented form disappears (measured win on v5e). Shared by the
    axis-mid C2C kernel and the natural-layout R2C/C2R kernels (rfft.py).
    """
    n = m * f
    if len(consts) == 4:
        w6m, tws_r, tws_i, w6f = consts
        wm = (None, None)
        wf = (None, None)
    else:
        (wm_r, wm_i, tws_r, tws_i, wf_r, wf_i) = consts
        w6m = w6f = None
        wm = (wm_r, wm_i)
        wf = (wf_r, wf_i)
    xr2 = xr.reshape(m, f * cols)         # x2[t', (j, l)]
    xi2 = xi.reshape(m, f * cols)
    yr, yi = _ks_complex_dot_swapped(xr2, xi2, wm[0], wm[1], mode, w6=w6m)
    yr = yr.reshape(f, cols, m)                      # (j, l, p) — no .T
    yi = yi.reshape(f, cols, m)
    twr = tws_r.T.reshape(f, 1, m)                   # tiny (m, f) const flip
    twi = tws_i.T.reshape(f, 1, m)
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
    wf_arg = w6f if w6f is not None else wf
    zr, zi = _combine_f(yr, yi, wf_arg, f, mode, sign)           # (q, l, p)
    # out[k = q*m + p, l]: swap the last two dims, merge leading (q, p)
    zr = jnp.swapaxes(zr, 1, 2).reshape(n, cols)
    zi = jnp.swapaxes(zi, 1, 2).reshape(n, cols)
    return zr, zi


# --------------------------------------------------------------------------
# BTS flavor: the zero-relayout axis-mid dataflow (DIF orientation).
#
# The twostep core's one remaining relayout is the exit (q, l, p) -> (q, p, l)
# lane<->sublane swap (round-2 attribution: the largest in-kernel cost).
# Splitting the input the DIF way removes it: with t = a*m + b and
# k = q + f*p',
#
#   X[q + f*p'] = sum_b W_m^{b p'} * ( W_n^{b q} * sum_a W_f^{a q} x[a*m+b] )
#
#   (1, n, TL) block --reshape--> (f, m, TL)            [leading split, free]
#   stage 1: f-DFT over the LEADING a dim — VPU radix-2 butterflies for
#            f in {2,4,8}, K-stacked leading-contract dot otherwise
#   twiddle: (f, m, 1) broadcast multiply                          [VPU]
#   stage 2: K-stacked dot contracting the MIDDLE b dim -> (2p', q, TL) [MXU]
#   --reshape--> (n, TL): leading (p', q) merge IS k = q + f*p'    [free]
#
# No lane<->sublane relayouts at either stage, no batched dots (Mosaic
# rejects unequal batch-dim positions — found empirically).
# --------------------------------------------------------------------------


def _bts_consts(n: int, sign: int, dtype, mode: str, scale: float = 1.0):
    """BTS (DIF) kernel consts: [tw_r (f, m), tw_i, Wm(...)] (+ Wf(...) iff f
    needs the MXU stage-1). ``scale`` folds into Wm (every element passes
    stage 2 exactly once)."""
    m, f = _twostep_split(n)
    tw = stage_twiddle(f, m, sign)                 # [q, b] = W_n^{qb}
    wm_r, wm_i = dft_matrix(m, sign)               # [b, p']
    consts = [np.asarray(tw[0], dtype), np.asarray(tw[1], dtype)]
    if mode == "bf16x3":
        consts.append(ks_w6_np(wm_r * scale, wm_i * scale))
    else:
        consts += [np.asarray(wm_r * scale, dtype),
                   np.asarray(wm_i * scale, dtype)]
    if f not in _BFLY_F:
        wf = dft_matrix(f, sign)
        if mode == "bf16x3":
            consts.append(ks_w6_np(wf[0], wf[1]))
        else:
            consts += [np.asarray(wf[0], dtype), np.asarray(wf[1], dtype)]
    return consts, (m, f)


def _bts_core(xr, xi, consts, m, f, mode, sign):
    """(n, L) -> (n, L) via the zero-relayout DIF dataflow."""
    n = m * f
    cols = xr.shape[-1]
    tw_r, tw_i = consts[0], consts[1]
    if mode == "bf16x3":
        wm_arg = consts[2]
        wf_arg = consts[3] if len(consts) > 3 else None
    else:
        wm_arg = (consts[2], consts[3])
        wf_arg = (consts[4], consts[5]) if len(consts) > 4 else None
    xr3 = xr.reshape(f, m, cols)
    xi3 = xi.reshape(f, m, cols)
    # stage 1: f-point DFT over the leading dim (natural q order)
    yr, yi = _combine_f(xr3, xi3, wf_arg, f, mode, sign)      # (q, b, L)
    # twiddle W_n^{qb}
    twr = tw_r.reshape(f, m, 1)
    twi = tw_i.reshape(f, m, 1)
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
    # stage 2: contract the middle b dim; leading output (p', q, L)
    if mode == "bf16x3":
        yhr, ylr = _bf16_split(yr)
        yhi_, yli_ = _bf16_split(yi)
        y6 = jnp.concatenate([yhr, ylr, yhr, yhi_, yli_, yhi_], axis=1)
        out = jax.lax.dot_general(
            wm_arg, y6, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (2p', q, L)
        p = out.shape[0] // 2
        zr, zi = out[:p], out[p:]
    else:
        def con(a, w):
            return _dg(w, a, (((0,), (1,)), ((), ())), mode)

        zr, zi = _cdot(yr, yi, wm_arg[0], wm_arg[1], con)
    # leading (p', q) merge: flat index p'*f + q == k
    return zr.reshape(n, cols), zi.reshape(n, cols)


def _bts2_consts(n: int, sign: int, dtype, mode: str, scale: float = 1.0,
                 m_pref: int = 0, p_trim: int = 0):
    """BTS2 (DIF, per-q dots) consts: f stage-2 matrices with the stage
    twiddle FOLDED in host-side — Wq[b, p'] = W_n^{qb} * Wm[b, p'] * scale —
    so the kernel has zero twiddle work; plus Wf iff f needs the MXU
    stage-1.

    ``p_trim > 0`` keeps only the first p_trim OUTPUT rows per q (output
    index k = q + f*p' < f*p_trim): the Bluestein inverse core discards
    rows k >= n, so trimming Wq to (m, p_trim) columns cuts the stage-2
    MXU MACs by p_trim/m (half, for the pow2-padded chirp-z) with zero
    arithmetic change to the kept rows."""
    m, f = _twostep_split(n, m_pref)
    tw_r, tw_i = stage_twiddle(f, m, sign)         # [q, b]
    wm_r, wm_i = dft_matrix(m, sign)               # [b, p']
    if p_trim and p_trim < m:
        wm_r, wm_i = wm_r[:, :p_trim], wm_i[:, :p_trim]
    consts = []
    for q in range(f):
        cr = tw_r[q][:, None] * wm_r - tw_i[q][:, None] * wm_i
        ci = tw_r[q][:, None] * wm_i + tw_i[q][:, None] * wm_r
        if mode == "bf16x3":
            consts.append(ks_w6_np(cr * scale, ci * scale))
        else:
            consts += [np.asarray(cr * scale, dtype),
                       np.asarray(ci * scale, dtype)]
    if f not in _BFLY_F:
        wf = dft_matrix(f, sign)
        if mode == "bf16x3":
            consts.append(ks_w6_np(wf[0], wf[1]))
        else:
            consts += [np.asarray(wf[0], dtype), np.asarray(wf[1], dtype)]
    return consts, (m, f)


def _bts2_core(xr, xi, consts, m, f, mode, sign, p_trim: int = 0,
               zero_from: int = 0):
    """(n, L) -> (n, L) DIF dataflow, stage 2 as f per-q 2-D K-stacked dots.

    vs :func:`_bts_core`: the rank-3 middle-contraction dot (Mosaic-slow)
    becomes f plain 2-D matmuls; the stage twiddle rides the per-q W
    constants; the only data movement left is the exit (q, p', L) ->
    (p', q, L) leading<->sublane permute (no lane crossing).

    ``p_trim``: the consts were built with ``_bts2_consts(p_trim=...)`` —
    stage 2 emits (p_trim, L) per q and the result is the FIRST f*p_trim
    rows of the full transform (callers slice to their true n).

    ``zero_from > 0``: input planes a >= zero_from are EXACT ZERO (the
    Bluestein pow2 pad); ``xr``/``xi`` then carry only zero_from*m rows
    and stage 1 runs zero-aware VPU butterflies (the padding never
    materializes and its butterfly level is free). Requires pow2 f <= 16
    and a known sign."""
    n = m * f
    p_out = p_trim if p_trim and p_trim < m else m
    cols = xr.shape[-1]
    if mode == "bf16x3":
        wq = consts[:f]
        wf_arg = consts[f] if len(consts) > f else None
    else:
        wq = [(consts[2 * q], consts[2 * q + 1]) for q in range(f)]
        wf_arg = (tuple(consts[2 * f:2 * f + 2])
                  if len(consts) > 2 * f else None)
    if zero_from and sign is not None and f in (2, 4, 8, 16):
        xr3 = xr.reshape(zero_from, m, cols)
        xi3 = xi.reshape(zero_from, m, cols)
        ins = [(xr3[a], xi3[a]) for a in range(zero_from)]
        ins += [None] * (f - zero_from)
        planes = bfly_dft_leading(ins, sign)
        zero = None
        for i, pl_ in enumerate(planes):   # all-zero subtree leftovers
            if pl_ is None:
                if zero is None:
                    zero = jnp.zeros_like(xr3[0])
                planes[i] = (zero, zero)
        xr3 = xi3 = None
    elif f in _BFLY_F and sign is not None:
        xr3 = xr.reshape(f, m, cols)
        xi3 = xi.reshape(f, m, cols)
        planes = bfly_dft_leading([(xr3[a], xi3[a]) for a in range(f)], sign)
    else:
        xr3 = xr.reshape(f, m, cols)
        xi3 = xi.reshape(f, m, cols)
        yr, yi = _combine_f(xr3, xi3, wf_arg, f, mode, sign)
        planes = [(yr[q], yi[q]) for q in range(f)]
    # stage 2: per-q twiddle-folded complex dot (b -> p'), all 2-D
    zr_parts, zi_parts = [], []
    for q in range(f):
        ar, ai = planes[q]
        if mode == "bf16x3":
            pr, pi = _ks_complex_dot(ar, ai, None, None, mode, w6=wq[q])
        else:
            pr, pi = _ks_complex_dot(ar, ai, wq[q][0], wq[q][1], mode)
        zr_parts.append(pr[None])
        zi_parts.append(pi[None])
    zr = jnp.concatenate(zr_parts, axis=0)           # (q, p', L)
    zi = jnp.concatenate(zi_parts, axis=0)
    # exit: leading<->sublane swap, then the (p', q) merge IS k = q + f*p'
    zr = jnp.transpose(zr, (1, 0, 2)).reshape(f * p_out, cols)
    zi = jnp.transpose(zi, (1, 0, 2)).reshape(f * p_out, cols)
    return zr, zi


def _kernel_axis_mid_bts2(m, f, tl, mode, sign, xr_ref, xi_ref, *refs):
    """(1, n, TL) mid-axis block through the per-q-dot DIF dataflow."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    n = m * f
    zr, zi = _bts2_core(xr_ref[:].reshape(n, tl), xi_ref[:].reshape(n, tl),
                        consts, m, f, mode, sign)
    or_ref[:] = zr.reshape(1, n, tl)
    oi_ref[:] = zi.reshape(1, n, tl)


def _kernel_axis_mid_bts(m, f, tl, mode, sign, xr_ref, xi_ref, *refs):
    """(1, n, TL) mid-axis block through the zero-relayout BTS dataflow."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    n = m * f
    zr, zi = _bts_core(xr_ref[:].reshape(n, tl), xi_ref[:].reshape(n, tl),
                       consts, m, f, mode, sign)
    or_ref[:] = zr.reshape(1, n, tl)
    oi_ref[:] = zi.reshape(1, n, tl)


def _nlead_core(body, xr, xi, consts, m, f, mode, sign):
    """n-leading (n, C) -> (n, C) core dispatch shared by the natural-layout
    R2C/C2R/DCT kernels: 'bts2' = zero-lane-relayout DIF dataflow (per-q
    twiddle-folded dots), 'ts' = the round-2 core (one exit relayout)."""
    if body == "bts2":
        return _bts2_core(xr, xi, consts, m, f, mode, sign)
    return _ts_core_nlead(xr, xi, consts, m, f, xr.shape[-1], mode, sign)


def _nlead_consts(n: int, sign: int, dtype, mode: str, scale: float = 1.0,
                  body: str = "bts2", m_pref: int = 0):
    """Constants for :func:`_nlead_core` (same (consts, (m, f)) contract as
    _twostep_consts/_bts2_consts)."""
    if body == "bts2":
        return _bts2_consts(n, sign, dtype, mode, scale, m_pref)
    return _twostep_consts(n, sign, dtype, mode, scale, m_pref)


def mid_core_body() -> str:
    """Which n-leading core the natural-layout kernels should use for the
    current config ('bts'/'bts2' C2C experiments both map to bts2 here)."""
    return "bts2" if config.mid_body != "ts" else "ts"


# --------------------------------------------------------------------------
# Fused Bluestein (chirp-z) axis-mid kernel: the ENTIRE prime/arbitrary-n
# transform in ONE Pallas pass.
#
# The XLA engine's Bluestein (_bluestein, ops/engine.py) pays ~6 extra HBM
# pass-pairs (chirp mul, pad, H mul, slice, chirp_b mul between the two
# sub-FFTs). Here the length-M convolution lives entirely in VMEM:
#
#   (1, n, TL) block -> x * chirp_a -> pad to M -> FFT_M -> * H
#                    -> IFFT_M (scale/M fused in stage consts) -> rows [:n]
#                    -> * chirp_b -> (1, n, TL) block
#
# so a prime-size transform costs the same HBM traffic as a smooth-size one
# (read n + write n), replacing rustfft's Rader/Bluestein SIMD specialists
# (SURVEY.md §2.2 N1; /root/reference/src/lib.rs:295-297 plans any n).
# M needs no smoothness for the kernel: any multiple of 128 with
# f = M/m <= 256 two-steps, so the pad overhead is <= 128/(2n-1).
# --------------------------------------------------------------------------

_BLUE_MAX_M = 16384


@lru_cache(maxsize=None)
def blue_kernel_M(n: int):
    """Kernel convolution length for Bluestein of size n, or None.

    Dense single-dot core below 256; otherwise the smallest multiple of 128
    >= 2n-1, capped at _BLUE_MAX_M. Every 128-multiple M <= 16384 has a
    twostep split (M//128 <= 128), so no further search is needed."""
    need = 2 * n - 1
    if need <= 256:
        return need
    M = -(-need // 128) * 128
    if M <= _BLUE_MAX_M:
        assert _twostep_split(M) is not None
        return M
    return None


def _blue_core_consts(M, sign, dtype, mode, scale=1.0, out_rows: int = 0):
    """(consts, kind, (m, f), p_trim) for one length-M sub-FFT in-kernel.

    ``out_rows > 0``: only the first out_rows output rows are needed (the
    Bluestein INVERSE core — its tail is sliced off). The dense and bts2
    kinds trim their stage-2 W columns accordingly (the pow2 chirp-z pad
    means out_rows ~ M/2: half the inverse's MXU MACs); 'ts' ignores it.
    """
    if M <= 256:
        wr_, wi_ = dft_matrix(M, sign)
        if out_rows and out_rows < M:
            wr_, wi_ = wr_[:, :out_rows], wi_[:, :out_rows]
        if mode == "bf16x3":
            return [ks_w6_np(wr_ * scale, wi_ * scale)], "dense", (M, 1), 0
        return [np.asarray(wr_ * scale, dtype),
                np.asarray(wi_ * scale, dtype)], "dense", (M, 1), 0
    m, f = _twostep_split(M)
    if f <= 16:
        # keep rows k = q + f*p' < f*p_trim >= out_rows
        p_trim = min(m, -(-out_rows // f)) if out_rows else 0
        consts, _ = _bts2_consts(M, sign, dtype, mode, scale, 0, p_trim)
        return consts, "bts2", (m, f), p_trim
    consts, _ = _twostep_consts(M, sign, dtype, mode, scale)
    return consts, "ts", (m, f), 0


def _blue_core(xr, xi, consts, kind, m, f, cols, mode, sign, p_trim=0,
               zero_from=0):
    if kind == "dense":
        if len(consts) == 1:
            return _ks_complex_dot(xr, xi, None, None, mode, w6=consts[0])
        return _ks_complex_dot(xr, xi, consts[0], consts[1], mode)
    if kind == "bts2":
        return _bts2_core(xr, xi, consts, m, f, mode, sign, p_trim,
                          zero_from)
    return _ts_core_nlead(xr, xi, consts, m, f, cols, mode, sign)


def _blue_consts(n: int, M: int, sign: int, dtype, mode: str,
                 scale: float = 1.0):
    """Constant tables for the fused kernel: [car, cai (n,1)], fwd core,
    [hr, hi (M,1)], inv core (user scale and 1/M fused), [cbr, cbi (n,1)].
    All chirp/H tables are built in f64 with integer phase reduction
    (plan.chirp) exactly like the plan's own Bluestein constants."""
    car, cai = chirp(n, sign)
    cw_r, cw_i = chirp(n, -sign)
    hr = np.zeros(M)
    hi = np.zeros(M)
    hr[:n], hi[:n] = cw_r, cw_i
    hr[M - n + 1:] = cw_r[1:][::-1]
    hi[M - n + 1:] = cw_i[1:][::-1]
    H = np.fft.fft(hr + 1j * hi)
    fwd, kind, (m, f), _ = _blue_core_consts(M, -1, dtype, mode)
    # inverse core: rows k >= n are sliced off in-kernel, so build its
    # stage-2 W trimmed to the needed rows (~half the inverse MXU MACs)
    inv, _, _, p_trim = _blue_core_consts(M, +1, dtype, mode,
                                          scale=scale / M, out_rows=n)

    def col(v):
        return np.asarray(v, dtype).reshape(-1, 1)

    # chirp_b == chirp_a (both exp(sign*i*pi*t^2/n), reference plan layout)
    consts = ([col(car), col(cai)] + fwd + [col(H.real), col(H.imag)]
              + inv + [col(car), col(cai)])
    sections = (2, len(fwd), 2, len(inv), 2)
    return consts, sections, kind, (m, f, p_trim)


def _kernel_axis_mid_blue(n, M, kind, m, f, p_trim, tl, mode, sections,
                          xr_ref, xi_ref, *refs):
    """(1, n, TL) block -> (1, n, TL): fused chirp-z, all work in VMEM."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    i0 = 0
    parts = []
    for s in sections:
        parts.append(consts[i0:i0 + s])
        i0 += s
    (car, cai), fwd, (hr, hi), inv, (cbr, cbi) = parts
    xr = xr_ref[:].reshape(n, tl)
    xi = xi_ref[:].reshape(n, tl)
    ar = xr * car - xi * cai
    ai = xr * cai + xi * car
    # the pow2 pad: on the bts2 path only materialize up to the first
    # zero PLANE boundary; the core's zero-aware butterflies take the
    # rest (free first DIF level)
    zfrom = -(-n // m) if (kind == "bts2" and f in (2, 4, 8, 16)) else 0
    pad_to = zfrom * m if zfrom else M
    pad = ((0, pad_to - n), (0, 0))
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)
    fr, fi = _blue_core(ar, ai, fwd, kind, m, f, tl, mode, -1,
                        zero_from=zfrom)
    gr = fr * hr - fi * hi
    gi = fr * hi + fi * hr
    zr, zi = _blue_core(gr, gi, inv, kind, m, f, tl, mode, +1, p_trim)
    zr = zr[:n]
    zi = zi[:n]
    or_ref[:] = (zr * cbr - zi * cbi).reshape(1, n, tl)
    oi_ref[:] = (zr * cbi + zi * cbr).reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_call_axis_mid_blue(n: int, sign: int, nb: int, cols: int,
                              dtype_str: str, interpret: bool, mode: str,
                              scale: float = 1.0, tcfg: int = 0,
                              donate: bool = False):
    dtype = jnp.dtype(dtype_str)
    M = blue_kernel_M(n)
    consts, sections, kind, (m, f, p_trim) = _blue_consts(
        n, M, sign, dtype, mode, scale)
    tile = _blue_tile(M, cols, dtype.itemsize, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_kernel_axis_mid_blue, n, M, kind, m, f, p_trim, tile, mode,
                sections),
        out_shape=(jax.ShapeDtypeStruct((nb, n, cols), dtype),
                   jax.ShapeDtypeStruct((nb, n, cols), dtype)),
        grid=grid,
        in_specs=[spec, spec] + const_specs,
        out_specs=(spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=int(20.0 * M * np.log2(max(M, 2)) * nb * cols),
            bytes_accessed=int(4 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate),
    )
    return lambda xr, xi: call(xr, xi, *consts)


# the fused-Bluestein body holds ~a dozen (M, tile) f32 intermediates live
# at once (chirp-mul, pad, fwd core, H-mul, inv core, exit chirp); bound the
# worst case at the tile floor of 128 like pallas_supported does, so
# oversized M falls back to the engine instead of failing Mosaic compile
_BLUE_LIVE_COPIES = 12


def _blue_tile(M: int, cols: int, itemsize: int, tcfg: int = 0) -> int:
    """Lane tile for the fused-Bluestein axis-mid kernel.

    The working set carries ~_BLUE_LIVE_COPIES length-M intermediates; the
    generic _mid_tile_budget(2M) formula overestimated it (16 copies of 2M)
    and floored prime kernels at tile 128 where the measured bts2 preference
    is the widest tile that fits (512 beat 256 by 11-22% at M<=1024,
    NOTES_TPU.md). The preference INVERTS at M=2048: an A/B/A sandwich on
    the prime-1021 bench row measured tile 128 at 153.9 us vs 168-174 us
    for the budget's tile-256 pick (2026-08-18 capture, BASELINE.md), so
    M >= 2048 floors at 128. Never exceeds cols rounded up to the 128-lane
    granule: an oversized block is legal Mosaic but computes on its padding
    (cols=256 under a 512 tile would do 2x the work).
    """
    if cols <= 128:
        return cols
    tile = 128 if M >= 2048 else 512
    while tile > 128 and (_BLUE_LIVE_COPIES * M * tile * itemsize
                          > int(0.4 * _VMEM_LIMIT)):
        tile //= 2
    tile = min(tile, -(-cols // 128) * 128)
    if tcfg:
        tile = _legal_tile(cols, tcfg)
    return tile


def blue_mid_supported(plan: C2CPlan, dtype) -> bool:
    """Fused-Bluestein axis-mid kernel eligibility (prime/arbitrary n)."""
    if not _use_pallas() or plan.kind != "bluestein":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    M = blue_kernel_M(plan.n)
    if M is None:
        return False
    if _BLUE_LIVE_COPIES * 128 * M * 4 > int(0.8 * _VMEM_LIMIT):
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def c2c_pallas_axis_mid_blue(xr, xi, plan: C2CPlan, scale=None):
    """Bluestein C2C along axis 1 of (B, n, L) split re/im arrays — one
    fused kernel pass (see module comment above)."""
    nb, n, cols = xr.shape
    run = _build_call_axis_mid_blue(n, plan.sign, nb, cols, str(xr.dtype),
                                    bool(config.pallas_interpret), dot_mode(),
                                    float(1.0 if scale is None else scale),
                                    int(config.pallas_tile),
                                    donate=bool(config.donate_io))
    return run(xr, xi)


# --------------------------------------------------------------------------
# Real-to-real fused chirp-z for the Makhoul DCT-II/III at Bluestein sizes
# (odd n beyond the dense cap, e.g. the reference dct2d grid's 2049 twin).
#
# The generic complex blue-mid path costs a DCT caller ~4 extra HBM passes
# per call: a materialized all-zeros imag input plane, an unused imag
# output plane, and separate XLA pre/post Makhoul-twiddle passes. Here the
# Makhoul constants FOLD into the kernel's entry/exit chirp multiplies
# host-side (complex const x const), the input is ONE real plane and the
# output ONE real plane:
#
#   DCT-II : y = Re( (chirp_b * w * s) . IFFT_M(FFT_M(v . chirp_a) * H) )
#            with v = evenodd-perm(x) (one XLA middle-axis pass)
#   DCT-III: z = Re( chirp_b . IFFT_M(FFT_M(x . (chirp_a * pre * s)) * H) )
#            with pre[0] also carrying the Makhoul x0-halving, so the
#            kernel consumes x DIRECTLY; one XLA un-perm pass after.
#
# HBM per call: 2 pass-pairs (perm/unperm + kernel) vs ~4 for the complex
# form — measured 1058 us for the dct2d_23_2049 pair before this variant.
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _blue_rr_consts_cached(n: int, dtype_str: str, mode: str, variant: str,
                           scale: float):
    """Folded constant tables for the real-to-real chirp-z kernel.

    variant 'dct2': exit const = chirp_b * e^{-i pi k/(2n)} * scale.
    variant 'dct3': entry const = chirp_a * e^{-i pi t/(2n)} * scale, with
    row 0 additionally halved (the Makhoul c0/2). Forward-FFT sign
    throughout (both Makhoul lowerings use FFT_n with sign -1)."""
    from ...plan import _cis

    dtype = jnp.dtype(dtype_str)
    M = blue_kernel_M(n)
    car, cai = chirp(n, -1)
    a = car + 1j * cai
    b = a.copy()
    t = np.arange(n, dtype=np.int64)
    w = _cis(t, 2 * n, -1)
    tw = (w[0] + 1j * w[1]) * scale
    if variant == "dct2":
        b = b * tw
    else:
        assert variant == "dct3"
        a = a * tw
        a[0] *= 0.5
    cw_r, cw_i = chirp(n, +1)
    hr = np.zeros(M)
    hi = np.zeros(M)
    hr[:n], hi[:n] = cw_r, cw_i
    hr[M - n + 1:] = cw_r[1:][::-1]
    hi[M - n + 1:] = cw_i[1:][::-1]
    H = np.fft.fft(hr + 1j * hi)
    fwd, kind, (m, f), _ = _blue_core_consts(M, -1, dtype, mode)
    inv, _, _, p_trim = _blue_core_consts(M, +1, dtype, mode,
                                          scale=1.0 / M, out_rows=n)

    def col(v):
        return np.asarray(v, dtype).reshape(-1, 1)

    consts = ([col(a.real), col(a.imag)] + fwd + [col(H.real), col(H.imag)]
              + inv + [col(b.real), col(b.imag)])
    sections = (2, len(fwd), 2, len(inv), 2)
    return consts, sections, kind, (m, f, p_trim), M


def _kernel_axis_mid_blue_rr(n, M, kind, m, f, p_trim, tl, mode, sections,
                             x_ref, *refs):
    """(1, n, TL) REAL block -> (1, n, TL) REAL block: fused chirp-z with
    the Makhoul twiddles riding the entry/exit constants."""
    consts = [r[:] for r in refs[:-1]]
    o_ref = refs[-1]
    i0 = 0
    parts = []
    for s in sections:
        parts.append(consts[i0:i0 + s])
        i0 += s
    (car, cai), fwd, (hr, hi), inv, (cbr, cbi) = parts
    x = x_ref[:].reshape(n, tl)
    ar = x * car
    ai = x * cai
    zfrom = -(-n // m) if (kind == "bts2" and f in (2, 4, 8, 16)) else 0
    pad_to = zfrom * m if zfrom else M
    pad = ((0, pad_to - n), (0, 0))
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)
    fr, fi = _blue_core(ar, ai, fwd, kind, m, f, tl, mode, -1,
                        zero_from=zfrom)
    gr = fr * hr - fi * hi
    gi = fr * hi + fi * hr
    zr, zi = _blue_core(gr, gi, inv, kind, m, f, tl, mode, +1, p_trim)
    zr = zr[:n]
    zi = zi[:n]
    o_ref[:] = (zr * cbr - zi * cbi).reshape(1, n, tl)


@lru_cache(maxsize=256)
def _build_call_axis_mid_blue_rr(n: int, nb: int, cols: int, dtype_str: str,
                                 interpret: bool, mode: str, variant: str,
                                 scale: float, tcfg: int = 0,
                                 donate: bool = False):
    dtype = jnp.dtype(dtype_str)
    consts, sections, kind, (m, f, p_trim), M = _blue_rr_consts_cached(
        n, dtype_str, mode, variant, scale)
    tile = _blue_tile(M, cols, dtype.itemsize, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_kernel_axis_mid_blue_rr, n, M, kind, m, f, p_trim, tile,
                mode, sections),
        out_shape=jax.ShapeDtypeStruct((nb, n, cols), dtype),
        grid=grid,
        in_specs=[spec] + const_specs,
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=int(20.0 * M * np.log2(max(M, 2)) * nb * cols),
            bytes_accessed=int(2 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate, 1),
    )
    return lambda x: call(x, *consts)


def dct23_blue_pallas_mid(x3, dct_type: int, scale=None):
    """Makhoul DCT-II/III core along axis 1 of a REAL (B, n, L) array at a
    Bluestein size — one real-to-real fused chirp-z pass. The caller owns
    the Makhoul permutation (DCT-II: before; DCT-III: un-perm after)."""
    nb, n, cols = x3.shape
    run = _build_call_axis_mid_blue_rr(
        n, nb, cols, str(x3.dtype), bool(config.pallas_interpret),
        dot_mode(), "dct2" if dct_type == 2 else "dct3",
        float(1.0 if scale is None else scale), int(config.pallas_tile),
        donate=bool(config.donate_io))
    return run(x3)


def _kernel_exit_mul(inner, xr_ref, xi_ref, *refs):
    """Wrap an axis-mid kernel body with a fused elementwise complex
    multiply on the output block — the four-step inter-stage twiddle
    W_N^{k1*t2} rides the kernel instead of costing an XLA HBM pass. The
    twiddle consts are the two refs before the outputs, blocked with the
    same column tiling as the data."""
    twr_ref, twi_ref, or_ref, oi_ref = refs[-4:]
    inner(xr_ref, xi_ref, *refs[:-4], or_ref, oi_ref)
    zr = or_ref[:]
    zi = oi_ref[:]
    twr = twr_ref[:].reshape(zr.shape)
    twi = twi_ref[:].reshape(zr.shape)
    or_ref[:] = zr * twr - zi * twi
    oi_ref[:] = zr * twi + zi * twr


def _kernel_axis_mid_dense(n, tl, mode, xr_ref, xi_ref, *refs):
    """(1, n, TL) block, n <= 256: one dense K-stacked DFT dot; the output
    rows land directly in the block layout (zero relayouts)."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    xr = xr_ref[:].reshape(n, tl)
    xi = xi_ref[:].reshape(n, tl)
    if len(consts) == 1:
        zr, zi = _ks_complex_dot(xr, xi, None, None, mode, w6=consts[0])
    else:
        zr, zi = _ks_complex_dot(xr, xi, consts[0], consts[1], mode)
    or_ref[:] = zr.reshape(1, n, tl)
    oi_ref[:] = zi.reshape(1, n, tl)


def _kernel_axis_mid_ts(m, f, tl, mode, sign, xr_ref, xi_ref, *refs):
    """Twostep dataflow on an (1, n, TL) mid-axis block via the n-leading
    core (no entry transpose — the block is already n-leading)."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    n = m * f
    zr, zi = _ts_core_nlead(xr_ref[:].reshape(n, tl),
                            xi_ref[:].reshape(n, tl), consts, m, f, tl, mode,
                            sign)
    or_ref[:] = zr.reshape(1, n, tl)
    oi_ref[:] = zi.reshape(1, n, tl)


def _mid_tile_budget(n: int, itemsize: int) -> int:
    """Largest 128-multiple lane tile whose axis-mid working set fits
    ~40% of the scoped VMEM limit. Measured on v5e at n=1024: tile 512
    beats 256 by 11-22% in two separately-controlled windows (42.1 vs
    54.0; 46.7 vs 52.6) — bigger blocks amortize the per-step relayout
    and DMA latency."""
    t = 512
    while t > 128 and 16 * t * n * itemsize > int(0.4 * _VMEM_LIMIT):
        t //= 2
    return t


def _legal_tile(cols: int, tcfg: int) -> int:
    """Snap a user-forced lane tile (config.pallas_tile) to a Mosaic-legal
    block width: the full cols extent, or a multiple of 128. A raw
    min(cols, tcfg) could yield e.g. 200 over cols=1024 — neither, which
    fails Mosaic compile on real TPU."""
    if tcfg >= cols:
        return cols
    return max(128, tcfg // 128 * 128)


def lane_tile_for(cols: int, tcfg: int, cap: int) -> int:
    """Shared axis-mid lane-tile policy (fft/rfft/dct builders): ``cap``
    clamped to cols rounded up to the 128 lane granule. A tile wider than
    that only adds padded lanes the MXU must chew through — at the
    dense-body 264 grid row a 512 tile costs 1.94x the dot FLOPs of the
    384 single block. An explicit tcfg (config.pallas_tile) overrides,
    snapped to a legal width."""
    if cols <= 128:
        return cols
    if tcfg:
        return _legal_tile(cols, tcfg)
    return min(cap, -(-cols // 128) * 128)


def _mid_tile(n: int, cols: int, itemsize: int, tcfg: int = 0) -> int:
    """C2C axis-mid lane tile: the VMEM-budget cap under the shared
    policy (lane_tile_for)."""
    return lane_tile_for(cols, tcfg, _mid_tile_budget(n, itemsize))


def _add_exit_tw(body, consts, const_specs, n, cols, tile, gc, sign, four_n,
                 dtype):
    """Append the four-step inter-stage twiddle W_{four_n}^{k1*t2} as a
    column-tiled const pair and wrap the body with the fused exit multiply."""
    assert four_n == n * cols, (four_n, n, cols)
    t4r, t4i = stage_twiddle(n, cols, sign)
    consts = consts + [np.asarray(t4r, dtype), np.asarray(t4i, dtype)]
    tw_spec = pl.BlockSpec((n, tile), lambda g: (0, g % gc),
                           memory_space=pltpu.VMEM)
    const_specs = const_specs + [tw_spec, tw_spec]
    return partial(_kernel_exit_mul, body), consts, const_specs


@lru_cache(maxsize=256)
def _build_call_axis_mid(n: int, sign: int, nb: int, cols: int,
                         dtype_str: str, interpret: bool, mode: str,
                         scale: float = 1.0, tcfg: int = 0,
                         mid_body: str = "bts2", four_n: int = 0,
                         mid_split: int = 0, donate: bool = False):
    """Leading-batch axis-mid flavor: (B, n, L) re/im -> (B, n, L) re/im,
    transform along the MIDDLE axis with no HBM transposes.

    This is the structurally right kernel for every non-minor transform
    axis: a Pallas input cannot absorb an XLA moveaxis (the transpose
    materializes in HBM before the kernel), so instead the kernel consumes
    the natural (pre, n, post) layout directly. Two bodies:

    * twostep body (n with an {128,256} split): blocks (1, n, TL), all
      heavy ops plain 2-D matmuls — measured fastest (the rank-3
      leading-output dot form ran 1.5x slower: Mosaic codegen).
    * generic body (other n): blocks (1, m, f, TL), recursive axis-0 core.
    """
    dtype = jnp.dtype(dtype_str)
    # mid_split is a bts2-body knob (config.py): the other bodies compute
    # their own split, so honoring it there would produce a gate/consts
    # mismatch
    mid_split = mid_split if mid_body == "bts2" else 0
    ts = _twostep_split(n, mid_split)
    # an explicitly forced mid_split wins the max_base_radix gate: the knob
    # exists to A/B the bts2 m=256/f=4 variant, which would otherwise be
    # silently rerouted to the generic body (m > max_base_radix)
    use_ts = n > 256 and ts is not None and (
        ts[0] <= config.max_base_radix or ts[0] == mid_split)
    # dense single-dot for small n, and for mid-size n WITHOUT a {128,256}
    # split (e.g. the reference's 264 grid), where the only alternative is
    # the slow recursive leading-dot body (measured 34 us at 264 vs the
    # dense dot's MXU estimate of ~8)
    use_dense = n <= 256 or (not use_ts and n <= 512)
    tile = _mid_tile(n, cols, dtype.itemsize, tcfg)
    gc = pl.cdiv(cols, tile)
    # 1-D grid (flattened (b, i)): pallas pipelines the innermost grid dim;
    # flattening removes the double-buffer stall at each batch boundary
    grid = (nb * gc,)
    flops = 10.0 * n * np.log2(max(n, 2)) * nb * cols
    # with a four-step exit twiddle the (n, tile) const pair streams once
    # per grid step — the same volume as one extra input pass-pair
    io_passes = 6 if four_n else 4
    common = dict(
        grid=grid,
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(io_passes * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    if use_dense:
        # n <= 256: ONE dense K-stacked DFT dot, zero relayouts — the
        # (2n, TL) output rows ARE the out block's layout. Replaces the
        # recursive leading-dot body (measured 5x slower at n=128 on the
        # --all grid: fft2d_128 9.9 us vs the comparable rfft/dct rows'
        # ~2 us).
        wr_, wi_ = dft_matrix(n, sign)
        if mode == "bf16x3":
            consts = [ks_w6_np(wr_ * scale, wi_ * scale)]
        else:
            consts = [np.asarray(wr_ * scale, dtype),
                      np.asarray(wi_ * scale, dtype)]
        spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(c.shape,
                                    lambda g, _r=c.ndim: (0,) * _r,
                                    memory_space=pltpu.VMEM) for c in consts]
        body = partial(_kernel_axis_mid_dense, n, tile, mode)
        if four_n:
            body, consts, const_specs = _add_exit_tw(
                body, consts, const_specs, n, cols, tile, gc, sign, four_n,
                dtype)
        call = pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((nb, n, cols), dtype),
                       jax.ShapeDtypeStruct((nb, n, cols), dtype)),
            in_specs=[spec, spec] + const_specs,
            out_specs=(spec, spec),
            **_donate_kw(donate),
            **common,
        )
        return lambda xr, xi: call(xr, xi, *consts)
    if use_ts:
        if mid_body == "bts2":
            consts, (m, f) = _bts2_consts(n, sign, dtype, mode, scale,
                                          mid_split)
            body = partial(_kernel_axis_mid_bts2, m, f, tile, mode, sign)
        elif mid_body == "bts":
            consts, (m, f) = _bts_consts(n, sign, dtype, mode, scale)
            body = partial(_kernel_axis_mid_bts, m, f, tile, mode, sign)
        else:
            consts, (m, f) = _twostep_consts(n, sign, dtype, mode, scale)
            body = partial(_kernel_axis_mid_ts, m, f, tile, mode, sign)
        spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(c.shape,
                                    lambda g, _r=c.ndim: (0,) * _r,
                                    memory_space=pltpu.VMEM) for c in consts]
        if four_n:
            body, consts, const_specs = _add_exit_tw(
                body, consts, const_specs, n, cols, tile, gc, sign, four_n,
                dtype)
        call = pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((nb, n, cols), dtype),
                       jax.ShapeDtypeStruct((nb, n, cols), dtype)),
            in_specs=[spec, spec] + const_specs,
            out_specs=(spec, spec),
            **_donate_kw(donate),
            **common,
        )
        return lambda xr, xi: call(xr, xi, *consts)

    if four_n:
        raise ValueError(
            f"four-step stage n={n} needs a dense or twostep kernel body")
    f, m, mid, lane, tw = _plan_consts(n, sign, dtype, scale)
    consts, struct, has_base, has_tw = _flat_consts(mid, lane, tw)
    in_spec = pl.BlockSpec((1, m, f, tile), lambda g: (g // gc, 0, 0, g % gc),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, f, m, tile), lambda g: (g // gc, 0, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_kernel_axis_mid, struct, has_base, has_tw, m, f, mode),
        out_shape=(jax.ShapeDtypeStruct((nb, f, m, cols), dtype),
                   jax.ShapeDtypeStruct((nb, f, m, cols), dtype)),
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        **common,
    )

    def run(xr, xi):
        xr = xr.reshape(nb, m, f, cols)
        xi = xi.reshape(nb, m, f, cols)
        yr, yi = call(xr, xi, *consts)
        return yr.reshape(nb, n, cols), yi.reshape(nb, n, cols)

    return run


def _kernel_axis_mid(struct, has_base, has_tw, m, f, mode,
                     xr_ref, xi_ref, *refs):
    """x block (1, m, f, TL) -> out block (1, f, m, TL)."""
    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages, base, lane, tw = _unflat(const_refs, struct, has_base, has_tw)
    tl = xr_ref.shape[-1]
    xr = xr_ref[:].reshape(m, f, tl)    # leading-dim squeeze (legal)
    xi = xi_ref[:].reshape(m, f, tl)
    if m == 1:
        def con3(x, w):
            return _con_mid(w, x, 1, 1, mode)

        yr, yi = _cdot(xr, xi, lane[0], lane[1], con3)
        or_ref[:] = jnp.swapaxes(yr, 0, 1).reshape(1, f, m, tl)
        oi_ref[:] = jnp.swapaxes(yi, 0, 1).reshape(1, f, m, tl)
        return
    zr, zi = _axis0_core(xr, xi, stages, base, lane, tw, m, f, mode)
    or_ref[:] = zr.reshape(1, f, m, tl)
    oi_ref[:] = zi.reshape(1, f, m, tl)


# --------------------------------------------------------------------------
# Four-step (Bailey) decomposition for long transforms (n > _MAX_N):
# eligibility/split here, dataflow in ops/engine._fourstep. rustfft handles
# any n at full speed (/root/reference/src/lib.rs:295-297); SURVEY §5 north
# star: "single long transforms stay on-chip".
# --------------------------------------------------------------------------

_FOURSTEP_MAX_N1 = 4096     # step-1 block (1, n1, tile) VMEM bound
_FOURSTEP_MAX_N2 = 16384    # step-3 lane-last kernel bound
# the step-1 kernel bakes the full (n1, n2) inter-stage twiddle W_N^{k1 t2}
# into host-built constants (8 bytes/point, _add_exit_tw) that live for the
# process (lru_cache); bound the transform length so the table stays a
# fraction of the data it rides with (2^22 -> 32 MB vs the 32 MB c64 array)
# instead of growing to 512 MB at the n1*n2 eligibility extreme
_FOURSTEP_MAX_N = 1 << 22


def _mid_stage_ok(k: int) -> bool:
    """Can k be a four-step stage (dense or twostep axis-mid body)?"""
    if k <= 256:
        return True
    ts = _twostep_split(k)
    return ts is not None and ts[0] <= config.max_base_radix


def fourstep_split(n: int):
    return _fourstep_split_cached(n, config.max_base_radix)


@lru_cache(maxsize=None)
def _fourstep_split_cached(n: int, _max_base: int):
    """(n1, n2) with n = n1*n2, both stages kernel-bodied, as balanced as
    possible (n1 the step-1 mid size, n2 the step-3 lane size); or None."""
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            for n1, n2 in ((n // d, d), (d, n // d)):
                if (n1 <= _FOURSTEP_MAX_N1 and n2 <= _FOURSTEP_MAX_N2
                        and _mid_stage_ok(n1) and _mid_stage_ok(n2)
                        and _lane_factor(n2) is not None):
                    if best is None or n1 + n2 < best[0] + best[1]:
                        best = (n1, n2)
        d += 1
    return best


def _kernel_lane_store_t(n2, ts, core, m, f, mode, sign, xr_ref, xi_ref,
                         *refs):
    """(1, TS, n2) block -> (1, n2, TS): FFT along the LANE dim with a
    TRANSPOSED store — the four-step's final (k1, k2) -> (k2, k1) global
    transpose rides this kernel's one entry relayout instead of costing a
    separate XLA HBM pass."""
    consts = [r[:] for r in refs[:-2]]
    or_ref, oi_ref = refs[-2:]
    xr = jnp.swapaxes(xr_ref[:].reshape(ts, n2), 0, 1)   # one relayout
    xi = jnp.swapaxes(xi_ref[:].reshape(ts, n2), 0, 1)
    zr, zi = _nlead_core(core, xr, xi, consts, m, f, mode, sign)
    or_ref[:] = zr.reshape(1, n2, ts)
    oi_ref[:] = zi.reshape(1, n2, ts)


@lru_cache(maxsize=256)
def _build_call_lane_store_t(n2: int, sign: int, nb: int, rows: int,
                             dtype_str: str, interpret: bool, mode: str,
                             scale: float = 1.0, core: str = "bts2"):
    """(B, rows, n2) re/im -> (B, n2, rows): lane-dim FFT + transposed
    store (four-step step 3+4)."""
    dtype = jnp.dtype(dtype_str)
    consts, (m, f) = _nlead_consts(n2, sign, dtype, mode, scale, core)
    ts = 256 if rows % 256 == 0 else 128
    gc = pl.cdiv(rows, ts)
    grid = (nb * gc,)
    in_spec = pl.BlockSpec((1, ts, n2), lambda g: (g // gc, g % gc, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n2, ts), lambda g: (g // gc, 0, g % gc),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_kernel_lane_store_t, n2, ts, core, m, f, mode, sign),
        out_shape=(jax.ShapeDtypeStruct((nb, n2, rows), dtype),
                   jax.ShapeDtypeStruct((nb, n2, rows), dtype)),
        grid=grid,
        in_specs=[in_spec, in_spec] + const_specs,
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * n2 * np.log2(max(n2, 2)) * nb * rows),
            bytes_accessed=int(4 * nb * rows * n2 * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    return lambda xr, xi: call(xr, xi, *consts)


def fourstep_supported(plan: C2CPlan, dtype) -> bool:
    """Four-step eligibility: n beyond the single-kernel range — either
    > _MAX_N, or inside it but failing the single-kernel VMEM working-set
    check (n ~20481..65536, which previously fell silently to the
    engine)."""
    if not _use_pallas() or plan.kind != "ct":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if plan.n > _FOURSTEP_MAX_N:
        return False    # exit-twiddle constant table bound (see above)
    if plan.n <= _MAX_N and _LIVE_COPIES * 128 * plan.n * 4 <= int(
            0.8 * _VMEM_LIMIT):
        return False    # the (faster) single-kernel path covers it
    if fourstep_split(plan.n) is None:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def mid_kernel_kind(n: int) -> str:
    """Which body the axis-mid builder will choose for n (for the
    debug_plan_log dispatch line): dense / bts2 / ts / bts / generic.
    Mirrors _build_call_axis_mid's gate exactly (incl. config.mid_split)."""
    ms = int(config.mid_split) if config.mid_body == "bts2" else 0
    ts = _twostep_split(n, ms)
    use_ts = n > 256 and ts is not None and (
        ts[0] <= config.max_base_radix or ts[0] == ms)
    if n <= 256 or (not use_ts and n <= 512):
        return "dense"
    if use_ts:
        return config.mid_body
    return "generic"


def c2c_pallas_axis_mid(xr, xi, plan: C2CPlan, scale=None):
    """C2C along axis 1 of (B, n, L) split re/im arrays, transpose-free.

    ``scale`` (a python float) is folded into the kernel constants — the
    fused scalar-normalization path, zero extra HBM traffic."""
    nb, n, cols = xr.shape
    run = _build_call_axis_mid(n, plan.sign, nb, cols, str(xr.dtype),
                               bool(config.pallas_interpret), dot_mode(),
                               float(1.0 if scale is None else scale),
                               int(config.pallas_tile), str(config.mid_body),
                               0, int(config.mid_split),
                               donate=bool(config.donate_io))
    return run(xr, xi)


def c2c_pallas(xr, xi, plan: C2CPlan, scale=None):
    """Batched lane-last C2C on (B, n) split re/im arrays via the fused kernel."""
    batch, n = xr.shape
    s = float(1.0 if scale is None else scale)
    if (config.pallas_flavor == "twostep" and n > 256
            and _twostep_split(n) is not None):
        run = _build_call_twostep(n, plan.sign, batch, str(xr.dtype),
                                  bool(config.pallas_interpret), dot_mode(),
                                  s, int(config.pallas_tile),
                                  donate=bool(config.donate_io))
        return run(xr, xi)
    run = _build_call(n, plan.sign, batch, str(xr.dtype),
                      bool(config.pallas_interpret), dot_mode(), s,
                      donate=bool(config.donate_io))
    return run(xr, xi)


def c2c_pallas_axis0(xr, xi, plan: C2CPlan, scale=None):
    """C2C along axis 0 of (n, cols) split re/im arrays, transpose-free."""
    n, cols = xr.shape
    run = _build_call_axis0(n, plan.sign, cols, str(xr.dtype),
                            bool(config.pallas_interpret), dot_mode(),
                            float(1.0 if scale is None else scale))
    return run(xr, xi)


# --------------------------------------------------------------------------
# Fused C2C spectral pipeline: fft -> diagonal multiply -> ifft in ONE
# kernel (the complex member of the round-5 fused-pipeline family; see
# rfft.py::_spectral_kernel_mid and dct.py::_spectral_dct_kernel_mid).
# Each unfused leg of ifft(H * fft(x)) is already aliased-copy-floor-bound
# (BASELINE.md round 5), so the only remaining lever for the chained step
# IS fusion: one read + one write of the field instead of two of each plus
# the spectrum round-trip. No reference analog (separate calls,
# src/lib.rs:350-421).
# --------------------------------------------------------------------------


def _spectral_c2c_kernel_mid(m, f, tl, mode, body, ncf,
                             xr_ref, xi_ref, hr_ref, hi_ref, *refs):
    """(1, n, TL) re/im + (n, 1) split H -> (1, n, TL) re/im
    = IFFT(H * FFT(x)); ``ncf`` = forward-core const count."""
    fwd = [r[:] for r in refs[:ncf]]
    inv = [r[:] for r in refs[ncf:-2]]
    or_ref, oi_ref = refs[-2:]
    n = m * f
    zr, zi = _nlead_core(body, xr_ref[:].reshape(n, tl),
                         xi_ref[:].reshape(n, tl), fwd, m, f, mode, -1)
    hr = hr_ref[:]                           # (n, 1)
    hi = hi_ref[:]
    sr = hr * zr - hi * zi
    si = hr * zi + hi * zr
    yr, yi = _nlead_core(body, sr, si, inv, m, f, mode, +1)
    or_ref[:] = yr.reshape(1, n, tl)
    oi_ref[:] = yi.reshape(1, n, tl)


def spectral_c2c_mid_supported(n: int, dtype) -> bool:
    """Fused-pipeline eligibility: the twostep axis-mid body (the other
    bodies fall back to the exact two-call composition)."""
    from ...plan import get_c2c_plan

    plan = get_c2c_plan(n, -1)
    if not pallas_supported(plan, dtype):
        return False
    # the builder collapses every non-'ts' body to bts2, so the split
    # gate must collapse the SAME way (a 'bts' config would otherwise
    # validate a different (m, f) than the kernel builds with)
    ms = int(config.mid_split) if config.mid_body != "ts" else 0
    ts = _twostep_split(n, ms)
    return bool(n > 256 and ts is not None
                and (ts[0] <= config.max_base_radix or ts[0] == ms))


@lru_cache(maxsize=256)
def _build_spectral_c2c_mid(n: int, nb: int, cols: int, dtype_str: str,
                            interpret: bool, mode: str, scale: float,
                            tcfg: int = 0, mid_body: str = "bts2",
                            mid_split: int = 0, donate: bool = False,
                            h_cols: int = 1):
    """(B, n, L) re/im + split H -> (B, n, L) re/im, axis 1.

    ``h_cols``: 1 for a (n,) broadcast H, or ``cols`` for a LANE-VARYING
    (n, L) multiplier (full-field filters; H streams one (n, tile) block
    per grid step). ``scale`` is the TOTAL scalar (inverse normalization
    x any forward scalar), folded into the inverse-core constants."""
    dtype = jnp.dtype(dtype_str)
    body = "bts2" if mid_body != "ts" else "ts"
    ms = mid_split if body == "bts2" else 0
    fwd, (m, f) = _nlead_consts(n, -1, dtype, mode, 1.0, body, ms)
    inv, _ = _nlead_consts(n, +1, dtype, mode, scale, body, ms)
    consts = fwd + inv
    tile = _mid_tile(n, cols, dtype.itemsize, tcfg)
    gc = pl.cdiv(cols, tile)
    grid = (nb * gc,)
    spec = pl.BlockSpec((1, n, tile), lambda g: (g // gc, 0, g % gc),
                        memory_space=pltpu.VMEM)
    h_spec = (pl.BlockSpec((n, 1), lambda g: (0, 0),
                           memory_space=pltpu.VMEM) if h_cols == 1 else
              pl.BlockSpec((n, tile), lambda g: (0, g % gc),
                           memory_space=pltpu.VMEM))
    const_specs = [pl.BlockSpec(c.shape, lambda g, _r=c.ndim: (0,) * _r,
                                memory_space=pltpu.VMEM) for c in consts]
    call = pl.pallas_call(
        partial(_spectral_c2c_kernel_mid, m, f, tile, mode, body,
                len(fwd)),
        out_shape=(jax.ShapeDtypeStruct((nb, n, cols), dtype),
                   jax.ShapeDtypeStruct((nb, n, cols), dtype)),
        grid=grid,
        in_specs=[spec, spec, h_spec, h_spec] + const_specs,
        out_specs=(spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=int(20.0 * n * np.log2(max(n, 2)) * nb * cols),
            bytes_accessed=int(4 * nb * cols * n * dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        **_donate_kw(donate),
    )
    return lambda xr, xi, hr, hi: call(xr, xi, hr, hi, *consts)


def spectral_c2c_pallas_mid(xr, xi, hr, hi, scale=None):
    """(B, n, L) split re/im, (n, 1)/(n, L) split H -> (B, n, L) re/im."""
    nb, n, cols = xr.shape
    run = _build_spectral_c2c_mid(n, nb, cols, str(xr.dtype),
                                  bool(config.pallas_interpret), dot_mode(),
                                  float(1.0 if scale is None else scale),
                                  int(config.pallas_tile),
                                  str(config.mid_body),
                                  int(config.mid_split),
                                  donate=bool(config.donate_io),
                                  h_cols=int(hr.shape[-1]))
    return run(xr, xi, hr, hi)
