"""DCT types 1-4 lowered to (real) FFTs — the rustdct capability rebuilt.

The reference delegates DCT math to rustdct (SURVEY.md §2.2 N3). Here each
type is lowered to the engine's FFT schedules with pre/post twiddles, in the
rustdct convention (== scipy's unnormalized dct / 2 — the reference's Default
normalization multiplies by 2 to produce scipy values, src/lib.rs:736-741):

  DCT-I   y[k] = (x0 + (-1)^k x_{n-1})/2 + sum_{t=1}^{n-2} x_t cos(pi t k/(n-1))
          == Re(FFT_{2n-2}(even-extension))[k] / 2
  DCT-II  y[k] = sum_t x_t cos(pi k (2t+1) / (2n))
          == Re( e^{-i pi k/(2n)} * FFT_n(even-odd permuted x)[k] )   (Makhoul)
  DCT-III y[k] = x0/2 + sum_{t>=1} x_t cos(pi t (2k+1) / (2n))
          == unperm( Re( FFT_n((c, c0/2) * e^{-i pi t/(2n)}) ) )  (transpose
          of the Makhoul DCT-II algorithm; n-point)
  DCT-IV  y[k] = sum_t x_t cos(pi (2k+1)(2t+1) / (4n))
          == Re( e^{-i pi (2k+1)/(4n)} * FFT_{2n}(x_t e^{-i pi t/(2n)}, pad)[k] )

All transforms operate batched along the LAST axis on real arrays.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..plan import _cis, get_c2c_plan, get_r2c_plan
from .engine import _cmul, _const, c2c, r2c


@lru_cache(maxsize=512)
def _dct2_consts(n: int):
    return _cis(np.arange(n, dtype=np.int64), 2 * n, -1)  # e^{-i pi k/(2n)}


def _evenodd_perm(x):
    """Makhoul permutation [x0, x2, .., x_odd desc] via slice+flip (no
    TPU gather): evens ascending then odds descending."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2][..., ::-1]], axis=-1)


def dct2(x):
    """(..., n) real -> DCT-II, rustdct convention."""
    n = x.shape[-1]
    if n == 1:
        return x
    w = _dct2_consts(n)
    m = n // 2 + 1
    v = _evenodd_perm(x)
    vr, vi = r2c(v, get_r2c_plan(n))
    # Hermitian unfold V[k] = conj(V[n-k]) for k >= m via flip/concat
    # (fuses on TPU, unlike a gather): tail indices n-1..m == flip(1..n-m)
    vr_full = jnp.concatenate([vr, vr[..., 1:n - m + 1][..., ::-1]], axis=-1)
    vi_full = jnp.concatenate([vi, -vi[..., 1:n - m + 1][..., ::-1]], axis=-1)
    wr, wi = _const(w, x.dtype)
    return vr_full * wr - vi_full * wi


@lru_cache(maxsize=512)
def _dct3_consts(n: int):
    # inverse-Makhoul: DCT-III is the transpose of the DCT-II algorithm:
    #   z[perm] = Re( FFT_n( (c with c0/2) * e^{-i pi t/(2n)} ) )
    return _cis(np.arange(n, dtype=np.int64), 2 * n, -1)  # e^{-i pi t/(2n)}


def _evenodd_unperm(u, n):
    """Scatter z[perm] = u without a TPU gather: z[2t] = u[t] (t < ceil),
    z[2t+1] = flip(u[ceil:]) — interleave via stack+reshape (odd n pads one
    dummy slot that the final slice drops)."""
    ceil = (n + 1) // 2
    evens = u[..., :ceil]
    odds = u[..., ceil:][..., ::-1]
    if n % 2 == 1:
        odds = jnp.concatenate([odds, odds[..., :1]], axis=-1)  # dummy
    z = jnp.stack([evens, odds], axis=-1).reshape(u.shape[:-1] + (2 * ceil,))
    return z[..., :n]


def dct3(x):
    """(..., n) real -> DCT-III, rustdct convention (x0 halved internally).

    n-point complex FFT via the transpose of the Makhoul DCT-II algorithm
    (2-4x cheaper than the zero-padded 4n lowering)."""
    n = x.shape[-1]
    if n == 1:
        return 0.5 * x
    pre = _dct3_consts(n)
    c = jnp.concatenate([x[..., :1] * 0.5, x[..., 1:]], axis=-1)
    prer, prei = _const(pre, x.dtype)
    ur, ui = c * prer, c * prei
    zr, _ = c2c(ur, ui, get_c2c_plan(n, -1))
    return _evenodd_unperm(zr, n)


def dct1(x):
    """(..., n) real -> DCT-I, rustdct convention. Requires n >= 2."""
    n = x.shape[-1]
    if n < 2:
        raise ValueError(f"DCT-I requires length >= 2, got {n}")
    ext = jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)  # length 2n-2
    sr, _ = r2c(ext, get_r2c_plan(2 * n - 2))  # m = n bins exactly
    return 0.5 * sr


@lru_cache(maxsize=512)
def _dct4_consts(n: int):
    t = np.arange(n, dtype=np.int64)
    pre = _cis(t, 2 * n, -1)  # e^{-i pi t/(2n)}
    k = np.arange(n, dtype=np.int64)
    post = _cis(2 * k + 1, 4 * n, -1)  # e^{-i pi (2k+1)/(4n)}
    return pre, post


def dct4(x):
    """(..., n) real -> DCT-IV, rustdct convention."""
    n = x.shape[-1]
    pre, post = _dct4_consts(n)
    prer, prei = _const(pre, x.dtype)
    ur, ui = x * prer, x * prei
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n)]
    ur = jnp.pad(ur, pad)
    ui = jnp.pad(ui, pad)
    fr, fi = c2c(ur, ui, get_c2c_plan(2 * n, -1))
    postr, posti = _const(post, x.dtype)
    yr, _ = _cmul(fr[..., :n], fi[..., :n], postr, posti)
    return yr


DCT_FNS = {1: dct1, 2: dct2, 3: dct3, 4: dct4}
