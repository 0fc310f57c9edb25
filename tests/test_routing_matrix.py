"""Routing-matrix regression: every (transform, size, axis, norm) combo
must be numerically consistent between the Pallas kernel paths
(interpret mode) and the pure-XLA engine paths.

The api dispatch now has many branches (lane-last natural kernels,
axis-mid natural kernels, dense-matrix kernels, twostep/generic bodies,
engine fallbacks); this sweep pins that whichever branch a combination
lands on computes the same values.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from ndrustfft_tpu import (
    DctHandler, FftHandler, Normalization, R2cFftHandler, nddct1, nddct2,
    nddct3, nddct4, ndfft, ndfft_r2c, ndifft, ndifft_r2c,
)
from ndrustfft_tpu.config import config

_DCT = {1: nddct1, 2: nddct2, 3: nddct3, 4: nddct4}
_NORMS = {"default": None, "none": Normalization.NONE,
          "scalar": Normalization.scalar(0.3)}


def _run_all(n, axis, xr, xc):
    out = {}
    for nname, nm in _NORMS.items():
        hf = FftHandler(n) if nm is None else FftHandler(n).normalization(nm)
        hr = (R2cFftHandler(n) if nm is None
              else R2cFftHandler(n).normalization(nm))
        hd = DctHandler(n) if nm is None else DctHandler(n).normalization(nm)
        out[("fft", nname)] = np.asarray(ndfft(jnp.asarray(xc), hf, axis=axis))
        out[("ifft", nname)] = np.asarray(
            ndifft(jnp.asarray(xc), hf, axis=axis))
        sp = ndfft_r2c(jnp.asarray(xr), hr, axis=axis)
        out[("r2c", nname)] = np.asarray(sp)
        out[("c2r", nname)] = np.asarray(ndifft_r2c(sp, hr, axis=axis))
        for k, fn in _DCT.items():
            out[(f"dct{k}", nname)] = np.asarray(
                fn(jnp.asarray(xr), hd, axis=axis))
    return out


@pytest.mark.parametrize("n,shape,axis", [
    (264, (2, 264, 16), 1),    # dense C2C / dense rfft / dense DCT
    (512, (2, 512, 16), 1),    # twostep + butterfly f=4 / nat mid kernels
    (129, (2, 129, 16), 1),    # odd: dense DCT, odd r2c rowpair
    (1024, (2, 1024, 16), 1),  # headline: twostep f=8, all mid kernels
    (264, (16, 264), 1),       # lane-last orientation
])
def test_routing_matrix_pallas_vs_engine(n, shape, axis):
    from ndrustfft_tpu.api import _jitted

    rng = np.random.default_rng(n)
    xr = rng.standard_normal(shape).astype(np.float32)
    xc = (rng.standard_normal(shape)
          + 1j * rng.standard_normal(shape)).astype(np.complex64)
    old = (config.use_pallas, config.pallas_interpret)
    try:
        config.use_pallas = False
        config.pallas_interpret = False
        _jitted.cache_clear()
        a = _run_all(n, axis, xr, xc)
        config.use_pallas = True
        config.pallas_interpret = True
        _jitted.cache_clear()
        b = _run_all(n, axis, xr, xc)
    finally:
        config.use_pallas, config.pallas_interpret = old
        _jitted.cache_clear()
    for key in a:
        err = np.abs(b[key] - a[key]).max() / max(np.abs(a[key]).max(), 1e-30)
        assert err < 1e-3, (n, shape, axis, key, err)
