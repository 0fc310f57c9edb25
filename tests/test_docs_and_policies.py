"""Executable doc-examples + dtype/precision policy tests (round-2 items).

The reference ships a compiled, asserted doc-test on every public item
(src/lib.rs:34-51, 253-268, 353-366, 436-450, 545-558, 625-639, 754-769);
here pytest executes the docstring examples so they cannot rot.
"""

import doctest

import numpy as np
import pytest

import jax.numpy as jnp

import ndrustfft_tpu
import ndrustfft_tpu.api
import ndrustfft_tpu.handlers
import ndrustfft_tpu.normalization


@pytest.mark.parametrize("mod", [
    ndrustfft_tpu,
    ndrustfft_tpu.api,
    ndrustfft_tpu.handlers,
    ndrustfft_tpu.normalization,
])
def test_doctests(mod):
    res = doctest.testmod(mod, verbose=False)
    assert res.failed == 0, f"{res.failed} doctest failures in {mod.__name__}"
    assert res.attempted > 0, f"no doctests collected in {mod.__name__}"


def test_doctests_cover_every_public_fn_family():
    # handler classes + core fn docstrings each carry >>> examples
    for obj in (ndrustfft_tpu.FftHandler, ndrustfft_tpu.R2cFftHandler,
                ndrustfft_tpu.DctHandler, ndrustfft_tpu.ndfft,
                ndrustfft_tpu.ndifft, ndrustfft_tpu.ndfft_r2c,
                ndrustfft_tpu.ndifft_r2c, ndrustfft_tpu.nddct1,
                ndrustfft_tpu.nddct2, ndrustfft_tpu.nddct3,
                ndrustfft_tpu.nddct4):
        assert ">>>" in (obj.__doc__ or ""), obj


def test_dtype_reexports():
    # reference re-exports Complex/Zero/FftNum (src/lib.rs:83-85); the
    # framework exports the dtype vocabulary so one import serves user code
    assert ndrustfft_tpu.complex64 is jnp.complex64
    assert ndrustfft_tpu.float64 is jnp.float64
    assert ndrustfft_tpu.complex_dtype(ndrustfft_tpu.float32) == jnp.complex64
    assert ndrustfft_tpu.complex_dtype(np.float64) == jnp.complex128
    assert ndrustfft_tpu.real_dtype(np.complex128) == jnp.float64
    assert ndrustfft_tpu.real_dtype(np.float32) == jnp.float32


class _FakeTpuDevice:
    platform = "tpu"
    device_kind = "TPU v5 lite"


class _FakeCpuDevice:
    platform = "cpu"
    device_kind = "cpu"


def test_tpu_f64_policy_raises():
    from ndrustfft_tpu.api import _check_tpu_f64

    with pytest.raises(ValueError, match="float64.*not supported on TPU"):
        _check_tpu_f64(jnp.float64, [_FakeTpuDevice()])
    with pytest.raises(ValueError, match="complex128"):
        _check_tpu_f64(jnp.complex128, [_FakeTpuDevice()])
    # f32 anywhere, or f64 on CPU: fine
    _check_tpu_f64(jnp.float32, [_FakeTpuDevice()])
    _check_tpu_f64(jnp.float64, [_FakeCpuDevice()])
    # policy escape hatch
    ndrustfft_tpu.config.tpu_f64 = "allow"
    try:
        _check_tpu_f64(jnp.float64, [_FakeTpuDevice()])
    finally:
        ndrustfft_tpu.config.tpu_f64 = "error"


def test_tpu_f64_guard_is_noop_on_cpu():
    # end-to-end: f64 on the CPU backend must keep working at full precision
    x = np.random.default_rng(0).standard_normal(16)
    got = np.asarray(ndrustfft_tpu.ndfft(jnp.asarray(x, jnp.complex128),
                                         axis=0))
    np.testing.assert_allclose(got, np.fft.fft(x), rtol=1e-12, atol=1e-12)


def test_max_base_radix_validation():
    from ndrustfft_tpu.plan import factorize

    with pytest.raises(ValueError, match="max_base_radix must be >= 3"):
        factorize(12, 2)
    old = ndrustfft_tpu.config.max_base_radix
    ndrustfft_tpu.config.max_base_radix = 1
    try:
        with pytest.raises(ValueError, match="max_base_radix"):
            factorize(12)
    finally:
        ndrustfft_tpu.config.max_base_radix = old


def test_tpu_f64_demote_policy():
    """tpu_f64='demote': f64/c128 on a TPU target computes the f32 twin at
    HIGHEST dot precision and casts back (~3e-7 tier); the decision record
    for why no ~1e-10 MXU path exists is DESIGN.md §9."""
    from ndrustfft_tpu.api import _check_tpu_f64, _demote_wanted, _run_demoted

    ndrustfft_tpu.config.tpu_f64 = "demote"
    try:
        # the error-path guard stands down
        _check_tpu_f64(jnp.float64, [_FakeTpuDevice()])
        assert _demote_wanted(jnp.complex128, [_FakeTpuDevice()])
        assert not _demote_wanted(jnp.complex128, [_FakeCpuDevice()])
        assert not _demote_wanted(jnp.complex64, [_FakeTpuDevice()])
        # end-to-end demoted run (CPU execution, same code path)
        from ndrustfft_tpu import FftHandler

        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 256)) + 1j * rng.standard_normal((8, 256))
        h = FftHandler(256)
        y = _run_demoted("fft", jnp.asarray(x, jnp.complex128), h, 1)
        assert y.dtype == jnp.complex128
        ref = np.fft.fft(x, axis=1)
        err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
        assert err < 1e-5, err  # the f32-exact tier, not the f64 tier
        # precision flip is restored afterwards
        assert ndrustfft_tpu.config.matmul_precision == "high"
    finally:
        ndrustfft_tpu.config.tpu_f64 = "error"
    # DESIGN.md §9 documents the decision
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    design = open(os.path.join(root, "DESIGN.md")).read()
    assert "f64 on TPU: accuracy tiers" in design
    assert "'demote'" in design


def test_precision_override_is_thread_local():
    """_run_demoted traces under config.precision_override (review fix):
    the old implementation mutated the global config.matmul_precision, so a
    concurrently traced f32 transform on another thread could silently
    compile at 'highest' (5-7x slower) or the demoted trace at bf16x3."""
    import threading

    import jax

    from ndrustfft_tpu.config import matmul_precision, precision_override

    seen = {}

    def other_thread():
        seen["p"] = matmul_precision()

    with precision_override("highest"):
        assert matmul_precision() == jax.lax.Precision.HIGHEST
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        # nested scope restores the outer override on exit
        with precision_override("default"):
            assert matmul_precision() == jax.lax.Precision.DEFAULT
        assert matmul_precision() == jax.lax.Precision.HIGHEST
    # other threads saw the configured precision, not the override
    assert seen["p"] == matmul_precision() == jax.lax.Precision.HIGH


def test_warmup_honors_tpu_f64_policy(monkeypatch):
    """warmup(float64=True) must apply the same tpu_f64 policy as dispatch
    (review fix): with the default 'error' policy it refuses instead of
    handing a raw f64 program to the TPU compiler (SIGABRT, NOTES_TPU.md),
    and under 'demote' it warms the ':demote' cache entry dispatch uses."""
    import jax

    import ndrustfft_tpu.api as api
    from ndrustfft_tpu import FftHandler

    monkeypatch.setattr(jax, "devices", lambda: [_FakeTpuDevice()])
    h = FftHandler(8)
    with pytest.raises(ValueError, match="not supported on TPU"):
        h.warmup((4, 8), float64=True, run=False)

    ndrustfft_tpu.config.tpu_f64 = "demote"
    try:
        api._jitted.cache_clear()
        # run=False (AOT only): zeros execution on a fake-TPU device list
        # would still run on the real CPU backend, but the point here is
        # the cache key — the ':demote' entry must be the one populated
        h.warmup((4, 8), float64=True, run=False)
        kinds = {k[0] for k in api._jitted.cache_keys()} if hasattr(
            api._jitted, "cache_keys") else None
        if kinds is None:
            # lru_cache has no key introspection: assert via cache_info +
            # a dispatch hit (no new compile) instead
            info_before = api._jitted.cache_info()
            fn = api._jitted("fft:demote", h, 1, api._config_key())
            assert api._jitted.cache_info().hits > info_before.hits
        else:
            assert "fft:demote" in kinds
    finally:
        ndrustfft_tpu.config.tpu_f64 = "error"
        api._jitted.cache_clear()
