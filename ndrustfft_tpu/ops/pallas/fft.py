"""Fused Pallas TPU kernel for batched C2C FFT (lane-last).

This is the TPU-native replacement for rustfft's butterfly kernels
(SURVEY.md §2.2 N1): the whole mixed-radix schedule for one tile of lanes
runs in VMEM — every element is read from HBM once and written once, instead
of round-tripping per stage as the pure-XLA lowering does. Base DFTs and the
combine contraction land on the MXU; twiddle multiplies on the VPU. Twiddle
tables are tiny plan constants that stay VMEM-resident across the whole grid.

Split re/im layout throughout (TPU has no complex registers). The kernel is
only generated for 'ct' plans in f32 whose per-tile working set fits VMEM;
everything else (Bluestein sizes, f64, huge n) falls back to the XLA engine.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from ...plan import C2CPlan
from ..engine import ct_valued

# per-tile VMEM working-set budget (bytes); the fused schedule keeps ~6
# live re/im copies of the tile during the deepest stage
_VMEM_BUDGET = 8 * 1024 * 1024
_LIVE_COPIES = 8


def _lane_tile(n: int, itemsize: int) -> int:
    """Largest power-of-two lane tile whose working set fits the budget."""
    t = 512
    while t > 8 and t * n * itemsize * _LIVE_COPIES > _VMEM_BUDGET:
        t //= 2
    return t


def pallas_supported(plan: C2CPlan, dtype) -> bool:
    if not config.use_pallas:
        return False
    if plan.kind != "ct":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if plan.n < 2 or plan.n > 65536:
        return False
    backend = jax.default_backend()
    return backend == "tpu" or config.pallas_interpret


def _flatten_consts(plan: C2CPlan, dtype):
    """Stage constants as a flat list of arrays + static shape structure.

    NUMPY arrays on purpose: _build_call may first run inside a user jit
    trace, and jnp.asarray would stage the dtype cast as a traced op whose
    tracer would then be cached and leak into later traces. Numpy constants
    are lifted per-trace by pallas_call instead.
    """
    consts = []
    struct = []
    for f, m, wf, tw in plan.stages:
        consts += [np.asarray(wf[0], dtype), np.asarray(wf[1], dtype),
                   np.asarray(tw[0], dtype), np.asarray(tw[1], dtype)]
        struct.append((f, m))
    consts += [np.asarray(plan.base[0], dtype), np.asarray(plan.base[1], dtype)]
    return consts, tuple(struct)


def _kernel(struct, n, xr_ref, xi_ref, *refs):
    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages = []
    i = 0
    for f, m in struct:
        wfr, wfi = const_refs[i][:], const_refs[i + 1][:]
        twr, twi = const_refs[i + 2][:], const_refs[i + 3][:]
        stages.append((f, m, (wfr, wfi), (twr, twi)))
        i += 4
    base = (const_refs[i][:], const_refs[i + 1][:])
    yr, yi = ct_valued(xr_ref[:], xi_ref[:], stages, base)
    or_ref[:] = yr
    oi_ref[:] = yi


@lru_cache(maxsize=256)
def _build_call(n: int, sign: int, batch: int, dtype_str: str, interpret: bool):
    from ...plan import get_c2c_plan

    plan = get_c2c_plan(n, sign)
    dtype = jnp.dtype(dtype_str)
    consts, struct = _flatten_consts(plan, dtype)
    tile = min(_lane_tile(n, dtype.itemsize), max(8, batch))
    grid = (pl.cdiv(batch, tile),)

    data_spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    flops_per = 8 * n * (sum(f for f, _ in struct) + plan.base[0].shape[0])
    call = pl.pallas_call(
        partial(_kernel, struct, n),
        out_shape=(jax.ShapeDtypeStruct((batch, n), dtype),
                   jax.ShapeDtypeStruct((batch, n), dtype)),
        grid=grid,
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=(data_spec, data_spec),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * batch,
            bytes_accessed=4 * batch * n * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def run(xr, xi):
        return call(xr, xi, *consts)

    return run


def c2c_pallas(xr, xi, plan: C2CPlan):
    """Batched lane-last C2C on (B, n) split re/im arrays via the fused kernel."""
    batch, n = xr.shape
    run = _build_call(n, plan.sign, batch, str(xr.dtype),
                      bool(config.pallas_interpret))
    return run(xr, xi)


def _kernel_axis0(struct, n, xr_ref, xi_ref, *refs):
    """Axis-0 flavor: block is (n, T); transform runs along dim 0 in VMEM
    (no HBM transpose — relayouts happen on-chip)."""
    from ..engine import ct_first_valued

    const_refs = refs[:-2]
    or_ref, oi_ref = refs[-2:]
    stages = []
    i = 0
    for f, m in struct:
        stages.append((f, m, (const_refs[i][:], const_refs[i + 1][:]),
                       (const_refs[i + 2][:], const_refs[i + 3][:])))
        i += 4
    base = (const_refs[i][:], const_refs[i + 1][:])
    yr, yi = ct_first_valued(xr_ref[:], xi_ref[:], stages, base)
    or_ref[:] = yr
    oi_ref[:] = yi


@lru_cache(maxsize=256)
def _build_call_axis0(n: int, sign: int, cols: int, dtype_str: str,
                      interpret: bool):
    from ...plan import get_c2c_plan

    plan = get_c2c_plan(n, sign)
    dtype = jnp.dtype(dtype_str)
    consts, struct = _flatten_consts(plan, dtype)
    tile = min(_lane_tile(n, dtype.itemsize), max(128, min(cols, 128)))
    grid = (pl.cdiv(cols, tile),)

    data_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    flops_per = 8 * n * (sum(f for f, _ in struct) + plan.base[0].shape[0])
    call = pl.pallas_call(
        partial(_kernel_axis0, struct, n),
        out_shape=(jax.ShapeDtypeStruct((n, cols), dtype),
                   jax.ShapeDtypeStruct((n, cols), dtype)),
        grid=grid,
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=(data_spec, data_spec),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * cols,
            bytes_accessed=4 * cols * n * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def run(xr, xi):
        return call(xr, xi, *consts)

    return run


def c2c_pallas_axis0(xr, xi, plan: C2CPlan):
    """C2C along axis 0 of (n, cols) split re/im arrays, transpose-free."""
    n, cols = xr.shape
    run = _build_call_axis0(n, plan.sign, cols, str(xr.dtype),
                            bool(config.pallas_interpret))
    return run(xr, xi)
