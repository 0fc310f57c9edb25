"""Seeded randomized consistency sweep across the whole public surface.

A cheap property-style net: random shapes/axes/kinds/dtypes, all checked
against numpy/scipy oracles. Failures print the exact configuration.
"""

import numpy as np
import pytest
import scipy.fft as sf

import jax.numpy as jnp
from ndrustfft_tpu import (
    DctHandler, DstHandler, FftHandler, R2cFftHandler, Normalization,
    nddct1, nddct2, nddct3, nddct4, nddst1, nddst2, nddst3, nddst4, ndfft,
    ndfft_r2c, ndifft, ndifft_r2c, ndspectral_c2c, ndspectral_dct,
    ndspectral_dst, ndspectral_r2c,
)

def _random_case(i):
    # per-index rng: a failing case index reproduces the SAME configuration
    # when rerun alone (a shared module rng would depend on run order)
    rng = np.random.default_rng(2026 + i)
    ndim = rng.integers(1, 4)
    shape = tuple(int(rng.integers(2, 20)) for _ in range(ndim))
    axis = int(rng.integers(0, ndim))
    kind = ["fft", "ifft", "r2c", "c2r", "dct1", "dct2", "dct3", "dct4",
            "dst1", "dst2", "dst3", "dst4", "spec_r2c", "spec_c2c",
            "spec_dct", "spec_dst"][i % 16]
    f64 = bool(rng.integers(0, 2))
    return rng, shape, axis, kind, f64


@pytest.mark.parametrize("i", range(96))
def test_random_case(i):
    rng, shape, axis, kind, f64 = _random_case(i)
    n = shape[axis]
    rdt = np.float64 if f64 else np.float32
    rtol = 1e-10 if f64 else 2e-4
    x = rng.standard_normal(shape).astype(rdt)
    if kind in ("fft", "ifft"):
        xc = (x + 1j * rng.standard_normal(shape)).astype(
            np.complex128 if f64 else np.complex64)
        h = FftHandler(n)
        if kind == "fft":
            got = np.asarray(ndfft(jnp.asarray(xc), h, axis=axis))
            ref = np.fft.fft(xc, axis=axis)
        else:
            got = np.asarray(ndifft(jnp.asarray(xc), h, axis=axis))
            ref = np.fft.ifft(xc, axis=axis)
    elif kind == "r2c":
        got = np.asarray(ndfft_r2c(jnp.asarray(x), R2cFftHandler(n), axis=axis))
        ref = np.fft.rfft(x.astype(np.float64), axis=axis)
    elif kind == "c2r":
        spec = np.fft.rfft(x.astype(np.float64), axis=axis)
        h = R2cFftHandler(n)
        sdt = np.complex128 if f64 else np.complex64
        got = np.asarray(ndifft_r2c(jnp.asarray(spec.astype(sdt)), h, axis=axis))
        ref = x.astype(np.float64)
    elif kind.startswith("dct"):
        t = int(kind[-1])
        if t == 1 and n < 2:
            pytest.skip("DCT-I needs n >= 2")
        fn = {1: nddct1, 2: nddct2, 3: nddct3, 4: nddct4}[t]
        got = np.asarray(fn(jnp.asarray(x), DctHandler(n), axis=axis))
        ref = sf.dct(x.astype(np.float64), type=t, axis=axis)
    elif kind.startswith("dst") and not kind.startswith("spec"):
        t = int(kind[-1])
        fn = {1: nddst1, 2: nddst2, 3: nddst3, 4: nddst4}[t]
        got = np.asarray(fn(jnp.asarray(x), DstHandler(n), axis=axis))
        ref = sf.dst(x.astype(np.float64), type=t, axis=axis)
    elif kind == "spec_r2c":
        if n % 2:
            n2 = n  # odd n exercises the composition fallback
        m = n // 2 + 1
        H = (rng.standard_normal(m)
             + 1j * rng.standard_normal(m)).astype(
                 np.complex128 if f64 else np.complex64)
        got = np.asarray(ndspectral_r2c(jnp.asarray(x), jnp.asarray(H),
                                        R2cFftHandler(n), axis=axis))
        S = np.fft.rfft(x.astype(np.float64), axis=axis)
        shp = [1] * x.ndim
        shp[axis] = m
        S = S * np.asarray(H, np.complex128).reshape(shp) / n
        sl = [slice(None)] * x.ndim
        sl[axis] = 0
        S[tuple(sl)] = S[tuple(sl)].real
        if n % 2 == 0:
            sl[axis] = -1
            S[tuple(sl)] = S[tuple(sl)].real
        ref = np.fft.irfft(S * n, n=n, axis=axis)
    elif kind == "spec_c2c":
        xc = (x + 1j * rng.standard_normal(shape)).astype(
            np.complex128 if f64 else np.complex64)
        H = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(
                 np.complex128 if f64 else np.complex64)
        got = np.asarray(ndspectral_c2c(jnp.asarray(xc), jnp.asarray(H),
                                        FftHandler(n), axis=axis))
        shp = [1] * x.ndim
        shp[axis] = n
        ref = np.fft.ifft(np.asarray(H, np.complex128).reshape(shp)
                          * np.fft.fft(xc.astype(np.complex128),
                                       axis=axis), axis=axis)
    else:
        # spec_dct / spec_dst
        H = rng.standard_normal(n).astype(rdt)
        shp = [1] * x.ndim
        shp[axis] = n
        if kind == "spec_dct":
            hA = DctHandler(n).normalization(Normalization.NONE)
            hB = DctHandler(n).normalization(
                Normalization.scalar(2.0 / n))
            got = np.asarray(ndspectral_dct(jnp.asarray(x),
                                            jnp.asarray(H), hA, hB,
                                            axis=axis))
            y2 = sf.dct(x.astype(np.float64), type=2, axis=axis) / 2
            ref = sf.dct((2.0 / n) * H.astype(np.float64).reshape(shp)
                         * y2, type=3, axis=axis) / 2
        else:
            hA = DstHandler(n).normalization(Normalization.NONE)
            hB = DstHandler(n).normalization(
                Normalization.scalar(2.0 / n))
            got = np.asarray(ndspectral_dst(jnp.asarray(x),
                                            jnp.asarray(H), hA, hB,
                                            axis=axis))
            z2 = sf.dst(x.astype(np.float64), type=2, axis=axis) / 2
            ref = sf.dst((2.0 / n) * H.astype(np.float64).reshape(shp)
                         * z2, type=3, axis=axis) / 2
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < rtol, (shape, axis, kind, f64)
