"""Runtime configuration for ndrustfft_tpu.

The reference exposes compile-time Cargo features (``parallel``, ``avx``,
``sse``, ``neon`` — reference Cargo.toml:34-39); the TPU build replaces those
with runtime toggles: DFT-matmul precision on the MXU, the maximum base radix
the planner will lower to a dense DFT matmul before falling back to Bluestein,
and whether Pallas kernels are used on TPU (vs the pure-XLA engine).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class _Config:
    # MXU precision for DFT matmuls. 'highest' keeps f32 accumulation exact
    # enough for the rtol 1e-6 (f32) / 1e-12 (f64) parity targets; 'default'
    # allows bf16 passes (fast, low precision).
    matmul_precision: str = os.environ.get("NDRUSTFFT_TPU_PRECISION", "highest")
    # Largest base DFT the planner emits as a dense matmul. Primes above this
    # route the whole transform through Bluestein (chirp-z). 128 = one MXU tile.
    max_base_radix: int = int(os.environ.get("NDRUSTFFT_TPU_MAX_RADIX", "128"))
    # Use fused Pallas kernels on TPU when a kernel exists for the plan;
    # otherwise (or when False) the pure-XLA engine runs everywhere.
    use_pallas: bool = os.environ.get("NDRUSTFFT_TPU_PALLAS", "1") not in ("0", "false")
    # Kernel schedule flavor: 'mosaic' = reshape-free two-stage four-step
    # (real-TPU compatible); 'generic' = recursive mixed radix (interpreter).
    pallas_flavor: str = os.environ.get("NDRUSTFFT_TPU_PALLAS_FLAVOR", "mosaic")
    # Run Pallas kernels in interpreter mode (CPU testing of the kernel path).
    pallas_interpret: bool = os.environ.get("NDRUSTFFT_TPU_PALLAS_INTERPRET", "0") in (
        "1", "true")


config = _Config()


def matmul_precision():
    import jax

    return (
        jax.lax.Precision.HIGHEST
        if config.matmul_precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
