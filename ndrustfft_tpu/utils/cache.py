"""Persistent compilation cache (SURVEY.md §5 checkpoint/resume analog).

The reference's only persistent state is the rebuildable plan cache; the TPU
analog is XLA's persistent compilation cache keyed by the compiled schedule —
enabling it makes handler "planning" survive process restarts the way
rustfft plans survive within one.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_seconds: float = 0.5) -> str:
    """Turn on JAX's on-disk compilation cache. Returns the cache dir."""
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "ndrustfft_tpu", "xla"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_seconds)
    return path
