"""Reverse-mode autodiff through KERNEL-routed transforms.

Pallas kernels have no JAX autodiff rules; before round 4's _diffable
wrapper (api.py), ``jax.grad`` through any kernel-routed transform failed
to linearize on TPU — an extension gap the pure-Rust reference never has
to face (it has no autodiff at all; grads are a TPU-native capability of
this build). The wrapper is a custom_vjp whose backward runs the vjp of
the ENGINE lowering (same math, pure lax; engine==kernel numerics pinned
by tests/test_routing_matrix.py); linear policies take the vjp at zeros
(the map is linear, no residual kept), a custom callable (possibly
nonlinear) takes it at the saved primal.

These tests force kernel routes via interpret mode on CPU and pin
grad(kernel route) == grad(engine route) for every transform family,
plus the composition cases (jit+grad, grad-of-pipeline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from ndrustfft_tpu import (
    DctHandler, DstHandler, FftHandler, Normalization, R2cFftHandler,
    nddct1, nddct2, nddct3, nddct4, nddst2, ndfft, ndfft_r2c, ndifft,
    ndifft_r2c,
)
from ndrustfft_tpu.config import config

_N = 256  # kernel-eligible (dense/twostep) size
_REL = 5e-5


@pytest.fixture
def kernel_mode():
    prev = (config.use_pallas, config.pallas_interpret)
    config.use_pallas = True
    config.pallas_interpret = True
    yield
    config.use_pallas, config.pallas_interpret = prev


def _grad_both(loss, x):
    """(kernel-route grad, engine-route grad) of loss at x."""
    config.use_pallas = True
    gk = jax.grad(loss)(x)
    config.use_pallas = False
    ge = jax.grad(loss)(x)
    config.use_pallas = True
    return np.asarray(gk), np.asarray(ge)


def _pin(loss, x):
    gk, ge = _grad_both(loss, x)
    assert np.all(np.isfinite(gk))
    rel = np.abs(gk - ge).max() / (np.abs(ge).max() + 1e-30)
    assert rel < _REL, rel


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def test_grad_c2c_forward_kernel_route(kernel_mode):
    h = FftHandler(_N)
    _pin(lambda v: jnp.sum(jnp.abs(
        ndfft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2),
        _x((4, _N, _N)))


def test_grad_c2c_inverse_default_norm(kernel_mode):
    h = FftHandler(_N)
    _pin(lambda v: jnp.sum(jnp.abs(
        ndifft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2),
        _x((4, _N, _N)))


def test_grad_r2c_and_c2r(kernel_mode):
    hr = R2cFftHandler(_N)
    _pin(lambda v: jnp.sum(jnp.abs(ndfft_r2c(v, hr, axis=1)) ** 2),
         _x((4, _N, _N)))
    _pin(lambda v: jnp.sum(
        ndifft_r2c(jnp.asarray(v, jnp.complex64), hr, axis=1) ** 2),
        _x((2, _N // 2 + 1, _N)))


@pytest.mark.parametrize("dct_type,fn", [(1, nddct1), (2, nddct2),
                                         (3, nddct3), (4, nddct4)])
def test_grad_dct_family(kernel_mode, dct_type, fn):
    n = 257 if dct_type == 1 else _N  # odd n: DCT-I natural kernel route
    h = DctHandler(n)
    _pin(lambda v: jnp.sum(fn(v, h, axis=1) ** 2), _x((2, n, _N)))


def test_grad_dst_rides_dct_conjugations(kernel_mode):
    h = DstHandler(_N)
    _pin(lambda v: jnp.sum(nddst2(v, h, axis=1) ** 2), _x((2, _N, _N)))


def test_grad_custom_nonlinear_policy_saved_primal(kernel_mode):
    # a NONLINEAR custom callable: the vjp must be taken at the primal
    # (zero-point vjp would silently produce wrong grads here)
    h = FftHandler(_N).normalization(
        Normalization.custom(lambda v: v * jnp.abs(v)))
    _pin(lambda v: jnp.sum(jnp.abs(
        ndifft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2),
        _x((4, _N, _N)))


def test_grad_under_jit_and_vmap_compose(kernel_mode):
    h = FftHandler(_N)
    x = _x((4, _N, _N))

    def loss(v):
        return jnp.sum(jnp.abs(
            ndfft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2)

    g_jit = np.asarray(jax.jit(jax.grad(loss))(x))
    g_eager = np.asarray(jax.grad(loss)(x))
    np.testing.assert_allclose(g_jit, g_eager, rtol=5e-4,
                               atol=1e-4 * np.abs(g_eager).max())
    out = jax.vmap(lambda v: ndfft(v, h, axis=0))(
        jnp.asarray(np.zeros((3, _N, 8)), jnp.complex64))
    assert out.shape == (3, _N, 8)


def test_grad_spectral_pipeline_bluestein(kernel_mode):
    # prime n on a mid axis: the fused chirp-z kernel route
    n = 257
    h = FftHandler(n)
    _pin(lambda v: jnp.sum(jnp.abs(
        ndfft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2),
        _x((2, n, _N), seed=3))


def test_grad_through_pencil_transform(kernel_mode):
    # the pencil path's local transforms also carry the wrapper: grad of
    # a sharded 2-D spectral loss on an 8-device mesh, kernel routes on
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from ndrustfft_tpu.parallel import fftn_pencil

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    v = _x((_N, _N)).astype(jnp.complex64)

    def loss(x):
        out, _ = fftn_pencil(x, mesh, P("d", None))
        return jnp.sum(jnp.abs(out) ** 2)

    x = jax.device_put(v, NamedSharding(mesh, P("d", None)))
    config.use_pallas = True
    gk = np.asarray(jax.grad(loss)(x))
    config.use_pallas = False
    ge = np.asarray(jax.grad(loss)(x))
    config.use_pallas = True
    rel = np.abs(gk - ge).max() / (np.abs(ge).max() + 1e-30)
    assert np.all(np.isfinite(gk)) and rel < _REL, rel


def test_no_wrapper_on_plain_cpu_forward_mode_intact():
    # on CPU without interpret mode nothing is wrapped: forward-mode
    # (jvp) through the engine paths keeps working
    prev = (config.use_pallas, config.pallas_interpret)
    config.use_pallas = True
    config.pallas_interpret = False
    try:
        h = FftHandler(64)
        x = jnp.asarray(np.ones((4, 64)), jnp.complex64)
        y, t = jax.jvp(lambda v: ndfft(v, h, axis=1), (x,), (x,))
        np.testing.assert_allclose(np.asarray(y), np.asarray(t), rtol=1e-6)
    finally:
        config.use_pallas, config.pallas_interpret = prev


# --------------------------------------------------------------------------
# Forward-mode AD (round-5: the custom_jvp engine-tangent wrapper gives
# BOTH modes on kernel routes; the round-4 custom_vjp form made jvp raise)
# --------------------------------------------------------------------------


def _jvp_both(fn, x, t):
    """(kernel-route jvp tangent, engine-route jvp tangent)."""
    config.use_pallas = True
    _, tk = jax.jvp(fn, (x,), (t,))
    config.use_pallas = False
    _, te = jax.jvp(fn, (x,), (t,))
    config.use_pallas = True
    return np.asarray(tk), np.asarray(te)


def _pin_jvp(fn, x, t):
    tk, te = _jvp_both(fn, x, t)
    assert np.all(np.isfinite(tk))
    rel = np.abs(tk - te).max() / (np.abs(te).max() + 1e-30)
    assert rel < _REL, rel


def test_jvp_every_family_kernel_route(kernel_mode):
    from ndrustfft_tpu import nddst1, nddst3, nddst4
    h = FftHandler(_N)
    hr = R2cFftHandler(_N)
    hd = DctHandler(_N)
    xc = jnp.asarray(_x((2, _N, _N)), jnp.complex64)
    xr = _x((2, _N, _N), 1)
    tc = jnp.asarray(_x((2, _N, _N), 2), jnp.complex64)
    tr = _x((2, _N, _N), 3)
    _pin_jvp(lambda v: ndfft(v, h, axis=1), xc, tc)
    _pin_jvp(lambda v: ndifft(v, h, axis=1), xc, tc)
    _pin_jvp(lambda v: ndfft_r2c(v, hr, axis=1), xr, tr)
    xs = jnp.asarray(_x((2, _N // 2 + 1, _N), 4), jnp.complex64)
    ts = jnp.asarray(_x((2, _N // 2 + 1, _N), 5), jnp.complex64)
    _pin_jvp(lambda v: ndifft_r2c(v, hr, axis=1), xs, ts)
    for fn in (nddct1, nddct2, nddct3, nddct4, nddst1, nddst3, nddst4):
        _pin_jvp(lambda v, _f=fn: _f(v, axis=1), xr, tr)
    # hd exercises the handler-carrying path too
    _pin_jvp(lambda v: nddct2(v, hd, axis=1), xr, tr)


def test_linearize_and_jit_jvp_compose(kernel_mode):
    h = FftHandler(_N)
    x = jnp.asarray(_x((2, _N, _N)), jnp.complex64)
    t = jnp.asarray(_x((2, _N, _N), 2), jnp.complex64)
    y, lin = jax.linearize(lambda v: ndfft(v, h, axis=1), x)
    config.use_pallas = False
    _, te = jax.jvp(lambda v: ndfft(v, h, axis=1), (x,), (t,))
    config.use_pallas = True
    rel = np.abs(np.asarray(lin(t)) - np.asarray(te)).max() / (
        np.abs(np.asarray(te)).max() + 1e-30)
    assert rel < _REL, rel
    # jit(jvp) keeps working
    tk = jax.jit(lambda a, b: jax.jvp(
        lambda v: ndfft(v, h, axis=1), (a,), (b,))[1])(x, t)
    rel = np.abs(np.asarray(tk) - np.asarray(te)).max() / (
        np.abs(np.asarray(te)).max() + 1e-30)
    assert rel < _REL, rel


def test_jvp_custom_nonlinear_policy(kernel_mode):
    # nonlinear custom policy: the tangent is the engine jvp AT THE PRIMAL
    h = FftHandler(_N).normalization(
        Normalization.custom(lambda v: v * jnp.abs(v)))
    x = jnp.asarray(_x((2, _N, _N)), jnp.complex64)
    t = jnp.asarray(_x((2, _N, _N), 2), jnp.complex64)
    _pin_jvp(lambda v: ndifft(v, h, axis=1), x, t)


def test_hvp_forward_over_reverse(kernel_mode):
    h = FftHandler(_N)
    x = _x((2, _N, _N))
    t = _x((2, _N, _N), 2)

    def loss(v):
        return jnp.sum(jnp.abs(
            ndfft(jnp.asarray(v, jnp.complex64), h, axis=1)) ** 2)

    config.use_pallas = True
    hk = jax.jvp(jax.grad(loss), (x,), (t,))[1]
    config.use_pallas = False
    he = jax.jvp(jax.grad(loss), (x,), (t,))[1]
    config.use_pallas = True
    rel = np.abs(np.asarray(hk) - np.asarray(he)).max() / (
        np.abs(np.asarray(he)).max() + 1e-30)
    assert rel < _REL, rel


def test_jvp_through_pencil_transform(kernel_mode):
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from ndrustfft_tpu.parallel import fftn_pencil

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    v = jnp.asarray(_x((_N, _N)), jnp.complex64)
    t = jnp.asarray(_x((_N, _N), 2), jnp.complex64)

    def fn(x):
        out, _ = fftn_pencil(x, mesh, P("d", None))
        return out

    xs = jax.device_put(v, NamedSharding(mesh, P("d", None)))
    ts = jax.device_put(t, NamedSharding(mesh, P("d", None)))
    config.use_pallas = True
    _, tk = jax.jvp(fn, (xs,), (ts,))
    config.use_pallas = False
    _, te = jax.jvp(fn, (xs,), (ts,))
    config.use_pallas = True
    rel = np.abs(np.asarray(tk) - np.asarray(te)).max() / (
        np.abs(np.asarray(te)).max() + 1e-30)
    assert rel < _REL, rel
