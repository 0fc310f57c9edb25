"""config.donate_io (in-place HBM pages via input_output_aliases).

The round-4 copy-floor sweep (tools/floor_sweep.py, measured on v5e)
showed a chained Pallas copy inside a lax.fori_loop pays a hidden XLA
carry-copy — a full extra HBM round trip per iteration (~50 vs ~25.5
us/iteration at 1024^2 c64).  ``config.donate_io = True`` threads
``input_output_aliases`` into every same-shape kernel builder so chained
/ loop-carried transforms write in place.  These tests pin:

* numerics are identical with the flag on (single call AND chained loop,
  across every same-shape kernel family: bts2/dense axis-mid, lane-last,
  twostep, fused Bluestein, real-to-real Bluestein DCT);
* flipping the flag invalidates the api-level jit cache (fresh trace);
* the aliasing itself is legal — in interpret mode each grid step
  overwrites exactly the block it consumed, so any cross-step hazard
  would corrupt the comparison.

Reference capability analog: the reference's process_lane writes through
&mut output in place (/root/reference/src/lib.rs:316-341); donate_io is
the XLA-side equivalent (opt-in because a live input forces XLA to add a
defensive copy instead).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from ndrustfft_tpu import (
    DctHandler, FftHandler, Normalization, config, nddct2, ndfft, ndifft,
)


@pytest.fixture(autouse=True)
def _donate_mode():
    from ndrustfft_tpu.api import _jitted

    old = (config.pallas_interpret, config.use_pallas, config.donate_io)
    config.pallas_interpret = True
    config.use_pallas = True
    _jitted.cache_clear()
    yield
    (config.pallas_interpret, config.use_pallas, config.donate_io) = old
    _jitted.cache_clear()


def _flip(donate: bool):
    from ndrustfft_tpu.api import _jitted

    config.donate_io = donate
    _jitted.cache_clear()


# (shape, axis, n) triples covering every donated builder:
#   (B, n)        axis -1  -> _build_call / _build_call_twostep (lane-last)
#   (B, n, L)     axis  1  -> _build_call_axis_mid (bts2/dense)
#   prime n mid   axis  1  -> _build_call_axis_mid_blue (fused Bluestein)
CASES = [
    ((32, 1024), -1, 1024),     # twostep lane-last
    ((32, 64), -1, 64),         # single-kernel lane-last
    ((2, 1024, 256), 1, 1024),  # axis-mid bts2
    ((2, 64, 256), 1, 64),      # axis-mid dense
    ((2, 509, 256), 1, 509),    # axis-mid fused Bluestein
]


@pytest.mark.parametrize("shape,axis,n", CASES)
def test_donate_single_call_matches(shape, axis, n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)
    h = FftHandler(n)
    _flip(False)
    ref = np.asarray(ndfft(jnp.asarray(x), h, axis=axis))
    _flip(True)
    got = np.asarray(ndfft(jnp.asarray(x), h, axis=axis))
    np.testing.assert_array_equal(got, ref)


def test_donate_chained_loop_matches_numpy():
    # the exact bench-headline shape of computation: a fori_loop chain of
    # scalar-normalized inverse transforms with the input consumed each
    # iteration — the case the flag exists for
    n, K = 256, 5
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, n, 256)) + 1j
         * rng.standard_normal((2, n, 256))).astype(np.complex64)
    c = 1.001 / np.sqrt(n)
    h = FftHandler(n).normalization(Normalization.scalar(c))

    def chain(r, i):
        def body(_, carry):
            v = ndifft(jax.lax.complex(carry[0], carry[1]), h, axis=1)
            return (jnp.real(v), jnp.imag(v))

        return jax.lax.fori_loop(0, K, body, (r, i))

    ref = x.astype(np.complex128)
    for _ in range(K):
        ref = np.fft.ifft(ref, axis=1) * (c * n)

    _flip(True)
    rr, ii = jax.jit(chain)(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4

    # and bit-identical to the same chain with the flag off
    _flip(False)
    rr0, ii0 = jax.jit(chain)(jnp.asarray(x.real), jnp.asarray(x.imag))
    np.testing.assert_array_equal(np.asarray(rr), np.asarray(rr0))
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(ii0))


def test_donate_live_input_still_correct():
    # y = fft(x) with x STILL LIVE afterwards: XLA must insert a defensive
    # copy rather than let the kernel clobber x (the documented trade-off)
    n = 1024
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, n, 256)) + 1j
         * rng.standard_normal((2, n, 256))).astype(np.complex64)
    h = FftHandler(n)
    _flip(True)

    xj = jnp.asarray(x)
    y = ndfft(xj, h, axis=1)
    # x must be unchanged after the donated call
    np.testing.assert_array_equal(np.asarray(xj), x)
    ref = np.fft.fft(x, axis=1)
    assert (np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()) < 1e-4


def test_donate_rr_bluestein_dct():
    # real-to-real fused Bluestein DCT-II (single-plane aliasing, nplanes=1)
    n = 509
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, n, 256)).astype(np.float32)
    h = DctHandler(n)
    _flip(False)
    ref = np.asarray(nddct2(jnp.asarray(x), h, axis=1))
    _flip(True)
    got = np.asarray(nddct2(jnp.asarray(x), h, axis=1))
    np.testing.assert_array_equal(got, ref)


def test_donate_flag_invalidates_jit_cache():
    from ndrustfft_tpu.api import _config_key

    _flip(False)
    k0 = _config_key()
    _flip(True)
    assert _config_key() != k0


def test_donate_dct_family_kernels():
    """Round 5: DCT-II (fused Makhoul), the dense DCT kernel (any type,
    odd n), and the natural DCT-I kernel now thread input_output_aliases
    too — flag-on results must bit-match flag-off for each."""
    import scipy.fft as sf

    from ndrustfft_tpu import nddct1, nddct3, nddct4

    rng = np.random.default_rng(7)
    cases = [
        (nddct2, 256, 2),   # fused Makhoul DCT-II (newly donating)
        (nddct3, 256, 3),   # fused DCT-III (donating since round 4)
        (nddct1, 129, 1),   # dense kernel, odd n (newly donating)
        (nddct4, 128, 4),   # dense kernel DCT-IV (newly donating)
        (nddct1, 257, 1),   # natural DCT-I kernel (newly donating)
    ]
    for fn, n, t in cases:
        x = rng.standard_normal((2, n, 256)).astype(np.float32)
        _flip(False)
        ref = np.asarray(fn(jnp.asarray(x), axis=1))
        _flip(True)
        got = np.asarray(fn(jnp.asarray(x), axis=1))
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_allclose(
            got, sf.dct(x, type=t, axis=1), rtol=2e-4,
            atol=2e-4 * np.abs(ref).max())


def test_donate_chained_dct_pair_loop():
    """The bench DCT pair chain (dct3(dct2(x)) with the 2/n fold) under
    donate_io: both kernels alias in place inside a fori_loop — the exact
    pattern whose hidden carry copy the flag removes. Values must match
    the flag-off chain bitwise over several iterations."""
    n = 256
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, n, 256)).astype(np.float32)
    h2 = DctHandler(n).normalization(Normalization.NONE)
    h3 = DctHandler(n).normalization(Normalization.scalar(2.0 / n))

    def chain(v):
        from ndrustfft_tpu import nddct3

        def body(_, c):
            return nddct3(nddct2(c, h2, axis=1), h3, axis=1)

        return jax.lax.fori_loop(0, 4, body, v)

    _flip(False)
    ref = np.asarray(jax.jit(chain)(jnp.asarray(x)))
    _flip(True)
    got = np.asarray(jax.jit(chain)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_allclose(got, x, rtol=1e-3, atol=1e-3)


def test_donate_chained_spectral_pipelines():
    # the round-5 fused pipelines are same-shape real->real / c64->c64 —
    # the aliasing case the separate r2c/c2r legs can never have. Chain
    # each in a fori_loop with the flag on and off: identical results.
    from ndrustfft_tpu import (
        DstHandler, R2cFftHandler, ndspectral_c2c, ndspectral_dct,
        ndspectral_dst, ndspectral_r2c,
    )
    from ndrustfft_tpu.api import (
        _spectral_c2c_jitted, _spectral_dct_jitted, _spectral_jitted,
    )

    n, K = 512, 3
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, n, 128)).astype(np.float32)
    Hr = np.ones(n // 2 + 1, np.float32)
    Hn = np.ones(n, np.float32)
    hr = R2cFftHandler(n).normalization(Normalization.scalar(1.001 / n))
    hc = FftHandler(n).normalization(Normalization.scalar(1.001 / n))
    hd2 = DctHandler(n).normalization(Normalization.NONE)
    hd3 = DctHandler(n).normalization(Normalization.scalar(2.002 / n))
    hs2 = DstHandler(n).normalization(Normalization.NONE)
    hs3 = DstHandler(n).normalization(Normalization.scalar(2.002 / n))

    cases = {
        "r2c": lambda v: ndspectral_r2c(v, Hr, hr, axis=1),
        "dct": lambda v: ndspectral_dct(v, Hn, hd2, hd3, axis=1),
        "dst": lambda v: ndspectral_dst(v, Hn, hs2, hs3, axis=1),
    }
    for name, step in cases.items():
        def chain(v, _s=step):
            return jax.lax.fori_loop(0, K, lambda _, c: _s(c), v)

        outs = {}
        for flag in (True, False):
            _flip(flag)
            for c in (_spectral_jitted, _spectral_dct_jitted):
                c.cache_clear()
            outs[flag] = np.asarray(jax.jit(chain)(jnp.asarray(x)))
        np.testing.assert_array_equal(outs[True], outs[False])
        # drift-chain oracle: each step is the scaled identity
        ref = x * (1.001 ** K)
        assert np.abs(outs[True] - ref).max() < 1e-3, name

    # complex pipeline
    xc = (x + 1j * rng.standard_normal(x.shape)).astype(np.complex64)

    def chainc(r, i):
        def body(_, carry):
            v = ndspectral_c2c(jax.lax.complex(carry[0], carry[1]), Hn,
                               hc, axis=1)
            return (jnp.real(v), jnp.imag(v))

        return jax.lax.fori_loop(0, K, body, (jnp.real(xc_j),
                                              jnp.imag(xc_j)))

    xc_j = jnp.asarray(xc)
    outs = {}
    for flag in (True, False):
        _flip(flag)
        _spectral_c2c_jitted.cache_clear()
        rr, ii = jax.jit(chainc)(jnp.real(xc_j), jnp.imag(xc_j))
        outs[flag] = np.asarray(rr) + 1j * np.asarray(ii)
    np.testing.assert_array_equal(outs[True], outs[False])
    ref = xc * (1.001 ** K)
    assert np.abs(outs[True] - ref).max() < 1e-3
