"""Multi-chip layer: slab/pencil decompositions over jax.sharding meshes."""

from . import runtime  # noqa: F401  — multi-process (jax.distributed) helpers
from .pencil import (  # noqa: F401
    Step, fftn_pencil, fftn_pencil_dd, irfftn_pencil, pencil_transform,
    plan_pencil, rfftn_pencil, spectral_pencil,
)

__all__ = [
    "Step", "pencil_transform", "plan_pencil",
    "fftn_pencil", "fftn_pencil_dd", "rfftn_pencil", "irfftn_pencil",
    "spectral_pencil",
]
