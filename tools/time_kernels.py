"""Per-variant chain timing on the current backend (one variant per process:
a failed TPU program poisons the session, NOTES_TPU.md).

Usage: python tools/time_kernels.py <variant> [n] [batch]
Variants: engine | twostep | mosaic | jnpfft | r2c_engine | r2c_pallas
         | axis_mid (pallas, transform axis 1) | engine_ax1 | jnpfft_ax1
         | fused_ifft (pallas axis 1, scalar norm fused in-kernel)
         | jnp_ifft (jnp.fft.ifft axis 1 + external scalar multiply)
Prints one JSON line {variant, n, us_per_transform, gflops}.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16

if variant in ("twostep", "mosaic"):
    os.environ["NDRUSTFFT_TPU_PALLAS"] = "1"
    os.environ["NDRUSTFFT_TPU_PALLAS_FLAVOR"] = variant
elif variant in ("r2c_pallas", "axis_mid", "dct_pallas", "fused_ifft",
                 "r2c_mid", "dct_mid"):
    os.environ["NDRUSTFFT_TPU_PALLAS"] = "1"
else:
    os.environ["NDRUSTFFT_TPU_PALLAS"] = "0"

AXIS = (1 if variant.endswith("_ax1") or variant in
        ("axis_mid", "fused_ifft", "jnp_ifft") else 2)

import numpy as np  # noqa: E402

from bench import per_transform  # noqa: E402

rng = np.random.default_rng(0)

if variant.startswith("dct"):
    # dct_mid: axis-1 pair through the axis-mid kernels, fused drift norm
    ax = 1 if variant == "dct_mid" else 2
    x = rng.standard_normal((B, n, n)).astype(np.float32)

    def make_step():
        from ndrustfft_tpu import DctHandler, Normalization, nddct2, nddct3

        h2 = DctHandler(n).normalization(Normalization.NONE)
        h3 = DctHandler(n).normalization(
            Normalization.scalar(2.0 * 1.001 / n))
        return lambda v: nddct3(nddct2(v, h2, axis=ax), h3, axis=ax)

    t = per_transform(make_step(), x, scale=None, per_iter=2 * B)
elif variant.startswith("r2c"):
    if variant == "r2c_hybrid":
        # XLA pack/unpack around the Pallas C2C_h kernel (no fused rfft)
        os.environ["NDRUSTFFT_TPU_PALLAS"] = "1"
        import ndrustfft_tpu.ops.pallas.rfft as _rf

        _rf.rfft_pallas_supported = lambda *a, **k: False
    ax = 1 if variant == "r2c_mid" else 2
    x = rng.standard_normal((B, n, n)).astype(np.float32)

    def make_step():
        from ndrustfft_tpu import (
            Normalization, R2cFftHandler, ndfft_r2c, ndifft_r2c,
        )

        h = R2cFftHandler(n)
        hi = R2cFftHandler(n).normalization(
            Normalization.scalar(1.001 / n))
        return lambda v: ndifft_r2c(ndfft_r2c(v, h, axis=ax), hi, axis=ax)

    t = per_transform(make_step(), x, scale=None, per_iter=2 * B)
elif variant in ("fused_ifft", "jnp_ifft"):
    # kernel-only chain: v <- c * ifft_u(v), c = sqrt(n)*(1+1e-3) keeps
    # magnitude ~neutral and guarantees no two iterations compute the same
    # value (c^k drift); our c rides the kernel constants (scalar norm),
    # the jnp baseline pays the multiply as a separate XLA pass.
    import math as _math

    x = (rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
         ).astype(np.complex64)
    # both compute v <- (1.001/sqrt(n)) * IFFT_u(v): the scalar policy
    # REPLACES the default 1/n, so ours fuses 1.001/sqrt(n); jnp's ifft
    # includes 1/n, so its external multiply is 1.001*sqrt(n)
    if variant == "fused_ifft":
        from ndrustfft_tpu import FftHandler, Normalization, ndifft

        h = FftHandler(n).normalization(
            Normalization.scalar(1.001 / _math.sqrt(n)))
        step = lambda v: ndifft(v, h, axis=1)  # noqa: E731
    else:
        import jax.numpy as jnp

        c = _math.sqrt(n) * 1.001
        step = lambda v: jnp.fft.ifft(v, axis=1) * c  # noqa: E731
    t = per_transform(step, x, scale=None, per_iter=B)
else:
    x = (rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
         ).astype(np.complex64)
    if variant.startswith("jnpfft"):
        import jax.numpy as jnp

        step = lambda v: jnp.fft.fft(v, axis=AXIS)  # noqa: E731
    else:
        from ndrustfft_tpu import FftHandler, ndfft

        h = FftHandler(n)
        step = lambda v: ndfft(v, h, axis=AXIS)  # noqa: E731
    t = per_transform(step, x, scale=1.0 / math.sqrt(n), per_iter=B)

print(json.dumps({
    "variant": variant, "n": n, "batch": B,
    "us_per_transform": round(t * 1e6, 2),
    "gflops": round(5.0 * n * math.log2(n) * n / t / 1e9, 1),
}))

# (appended variants — see header) fused-normalization chain: the scalar
# norm rides the kernel constants, so each chain iteration is KERNEL-ONLY
# (the complex boundary ops between iterations cancel via XLA's
# real(complex(a,b))->a simplification). Variants: fused_ifft (ours),
# jnp_ifft (baseline paying the external multiply it cannot fuse).
