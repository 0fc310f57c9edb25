"""Multi-axis convenience API tests (fftn/ifftn/rfftn/irfftn/dctn/idctn)."""

import numpy as np
import pytest
import scipy.fft as sf

import jax.numpy as jnp
from ndrustfft_tpu import dctn, fftn, idctn, ifftn, irfftn, rfftn


def test_fftn_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 8, 10)) + 1j * rng.standard_normal((6, 8, 10))
    got = np.asarray(fftn(jnp.asarray(x)))
    ref = np.fft.fftn(x)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())
    back = np.asarray(ifftn(jnp.asarray(got)))
    np.testing.assert_allclose(back, x, rtol=1e-11, atol=1e-12)


def test_fftn_subset_axes():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 6, 8)) + 0j
    got = np.asarray(fftn(jnp.asarray(x), axes=[0, 2]))
    ref = np.fft.fftn(x, axes=(0, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())


@pytest.mark.parametrize("shape", [(6, 8), (4, 6, 9)])
def test_rfftn_irfftn_roundtrip(shape):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape)
    spec = rfftn(jnp.asarray(x))
    ref = np.fft.rfftn(x)
    np.testing.assert_allclose(np.asarray(spec), ref, rtol=1e-10,
                               atol=1e-10 * np.abs(ref).max())
    back = np.asarray(irfftn(spec, n_last=shape[-1]))
    np.testing.assert_allclose(back, x, rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize("dct_type", [1, 2, 3, 4])
def test_dctn_matches_scipy(dct_type):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((6, 9))
    got = np.asarray(dctn(jnp.asarray(x), dct_type))
    ref = sf.dctn(x, type=dct_type)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())


@pytest.mark.parametrize("dct_type", [1, 2, 3, 4])
def test_idctn_roundtrip(dct_type):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, 9))
    back = np.asarray(idctn(dctn(jnp.asarray(x), dct_type), dct_type))
    np.testing.assert_allclose(back, x, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("dct_type", [1, 2, 3])
def test_idctn_matches_scipy_idctn(dct_type):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((5, 7))
    got = np.asarray(idctn(jnp.asarray(x), dct_type))
    ref = sf.idctn(x, type=dct_type)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())


@pytest.mark.parametrize("dst_type", [1, 2, 3, 4])
def test_dstn_matches_scipy(dst_type):
    from ndrustfft_tpu import dstn

    rng = np.random.default_rng(6)
    x = rng.standard_normal((6, 9))
    got = np.asarray(dstn(jnp.asarray(x), dst_type))
    ref = sf.dstn(x, type=dst_type)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())


@pytest.mark.parametrize("dst_type", [1, 2, 3, 4])
def test_idstn_roundtrip(dst_type):
    from ndrustfft_tpu import dstn, idstn

    rng = np.random.default_rng(7)
    x = rng.standard_normal((6, 9))
    back = np.asarray(idstn(dstn(jnp.asarray(x), dst_type), dst_type))
    np.testing.assert_allclose(back, x, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("dst_type", [1, 2, 3, 4])
def test_idstn_matches_scipy_idstn(dst_type):
    from ndrustfft_tpu import idstn

    rng = np.random.default_rng(8)
    x = rng.standard_normal((5, 7))
    got = np.asarray(idstn(jnp.asarray(x), dst_type))
    ref = sf.idstn(x, type=dst_type)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())
