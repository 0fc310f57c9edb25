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


def test_eligibility_boundaries():
    """Pin the kernel-eligibility thresholds at their exact boundaries
    (round-2 verdict weak #8): a change that silently moves a cliff fails
    here, and config.debug_plan_log (tested in test_utils) tells users
    which side of a cliff they landed on."""
    import jax.numpy as jnp

    from ndrustfft_tpu import config
    from ndrustfft_tpu.api import _mid_dims
    from ndrustfft_tpu.ops.pallas.fft import (
        _MAX_N, _twostep_split, blue_kernel_M, fourstep_split,
        pallas_supported,
    )
    from ndrustfft_tpu.plan import get_c2c_plan

    old = config.pallas_interpret
    config.pallas_interpret = False
    try:
        class _A:  # minimal shape carrier for _mid_dims
            def __init__(self, shape):
                self.shape = shape
                self.ndim = len(shape)

        # cols threshold for the axis-mid kernels is 128 on real hardware
        assert _mid_dims(_A((2, 64, 127)), 1) is None
        assert _mid_dims(_A((2, 64, 128)), 1) == (2, 128)
        # and 8 in interpret mode
        config.pallas_interpret = True
        assert _mid_dims(_A((2, 64, 8)), 1) == (2, 8)
        assert _mid_dims(_A((2, 64, 7)), 1) is None
    finally:
        config.pallas_interpret = old
    # twostep split: m must be a multiple of 128 with f <= 256
    assert _twostep_split(128 * 256) == (128, 256)
    assert _twostep_split(128 * 257) is None
    assert _twostep_split(960) is None          # 960 = 2^6*3*5, 128 ∤ 960
    # single-kernel range ends at the VMEM working-set bound (~20k);
    # the four-step covers everything beyond it (incl. the former silent
    # 20481..65536 engine band)
    config.pallas_interpret = True
    try:
        from ndrustfft_tpu.ops.pallas.fft import fourstep_supported

        assert pallas_supported(get_c2c_plan(16384, -1), jnp.float32)
        assert not pallas_supported(get_c2c_plan(32768, -1), jnp.float32)
        assert fourstep_supported(get_c2c_plan(32768, -1), jnp.float32)
        assert not fourstep_supported(get_c2c_plan(16384, -1), jnp.float32)
        assert not pallas_supported(get_c2c_plan(2 * _MAX_N, -1),
                                    jnp.float32)
        assert fourstep_split(2 * _MAX_N) is not None
        assert fourstep_supported(get_c2c_plan(2 * _MAX_N, -1), jnp.float32)
    finally:
        config.pallas_interpret = old
    # Bluestein kernel M: smallest 128-multiple >= 2n-1, capped
    assert blue_kernel_M(509) == 1024
    assert blue_kernel_M(65) == 129             # dense core region
    assert blue_kernel_M(16000) is None         # beyond _BLUE_MAX_M
