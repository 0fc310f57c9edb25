"""Copy-floor attack sweep (round-4 verdict item #1).

Round 3 established that the bts2 C2C kernel body is statistically
indistinguishable from a chained Pallas copy at the same block specs
(ATTRIB_r03.jsonl) — i.e. the kernel rides a ~563 GB/s "DMA floor".
But every round-3 `copy` variant shared the kernels' (1, n, 512) block /
batch-major grid pattern, so a descriptor-pattern artifact would show up
identically on both sides.  This sweep times copy chains that do NOT
share that pattern:

  ctrl      (1,n,512) blocks, col-minor grid      — the round-3 control
  xla       pure-XLA x*1.001 chain, two f32 planes — the compiler's own copy
  xla_c64   pure-XLA chain on a complex64 array
  fullrow   (1,n,n) blocks (one whole plane per grid step)
  batch4    (4,n,512) blocks (4 batch entries per step)
  gorder    (1,n,512) blocks, batch-minor grid order
  flat2d    array viewed as (B*n, n); (2048,512) blocks, 2-D grid
  alias     ctrl + input_output_aliases (in-place pages)
  merged    one (1,2n,512) plane (half the descriptors) — round-3 copym
  pipe4     manual emit_pipeline copy ( deeper multi-buffering )

Protocol: dependent fused chains (v <- 1.001*v), K=34 vs K=134 slope to
cancel fixed dispatch overhead (the round-3 lesson: tunnel dispatch can
dwarf the chain).  The control is re-timed first/middle/last so window
drift is visible in the output.  All variants are pure copies — nothing
can poison the TPU session — so one process runs the whole sweep.

Usage: python tools/floor_sweep.py [n] [B] [--only v1,v2] [--json out]
Prints one JSON line per measurement: {variant, us_per_transform, gbps}.
"""

from __future__ import annotations

import json
import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 16
ONLY = None
OUT = None
if "--only" in sys.argv:
    ONLY = sys.argv[sys.argv.index("--only") + 1].split(",")
if "--json" in sys.argv:
    OUT = sys.argv[sys.argv.index("--json") + 1]

VMEM_LIMIT = 100 * 1024 * 1024
SCALE = 1.001
INTERP = jax.default_backend() == "cpu"

# bytes moved per chain iteration: read + write of both f32 planes
BYTES_PER_ITER = 2 * 2 * B * N * N * 4


def _cp(**kw):
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT, **kw)


def _pallas_copy(block, index_map, grid, merged=False, alias=False,
                 grid_names=None):
    """Build a two-plane (or merged single-plane) Pallas copy callable."""
    nplanes = 1 if merged else 2
    shape = (B, 2 * N, N) if merged else (B, N, N)
    spec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    def body(*refs):
        ins, outs = refs[:nplanes], refs[nplanes:]
        for i_ref, o_ref in zip(ins, outs):
            o_ref[:] = SCALE * i_ref[:]

    kw = dict(
        grid=grid,
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(nplanes)),
        in_specs=[spec] * nplanes,
        out_specs=tuple([spec] * nplanes),
        compiler_params=_cp(),
        interpret=INTERP,
    )
    if alias:
        kw["input_output_aliases"] = {i: i for i in range(nplanes)}
    call = pl.pallas_call(body, **kw)
    if merged:
        return lambda args: (call(args[0])[0],)
    return lambda args: call(*args)


def build(variant):
    """Return (chain_fn_factory, args, merged_flag). chain(K) jits a K-step
    dependent chain ending in a scalar readback."""
    gc = pl.cdiv(N, 512)

    if variant == "xla":
        def step(c):
            return tuple(SCALE * p for p in c)
        nplanes, shape = 2, (B, N, N)
    elif variant == "xlabar":
        # optimization_barrier per iteration: if plain `xla` beats this,
        # XLA was fusing consecutive multiplies across unrolled iterations
        # (inflating apparent bandwidth); this is the honest XLA copy chain
        def step(c):
            return jax.lax.optimization_barrier(
                tuple(SCALE * p for p in c))
        nplanes, shape = 2, (B, N, N)
    elif variant == "xlabar_c64":
        def chain(K):
            @jax.jit
            def run(c):
                z = jax.lax.complex(c[0], c[1])
                y = jax.lax.fori_loop(
                    0, K,
                    lambda _, v: jax.lax.optimization_barrier(SCALE * v), z)
                return jnp.sum(jnp.abs(y))
            return run
        rng = np.random.default_rng(0)
        args = tuple(jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
                     for _ in range(2))
        return chain, args
    elif variant == "xla_c64":
        # complex64 cannot cross the tunnel boundary (NOTES_TPU.md): feed
        # two f32 planes and build/consume the complex inside the jit
        def chain(K):
            @jax.jit
            def run(c):
                z = jax.lax.complex(c[0], c[1])
                y = jax.lax.fori_loop(0, K, lambda _, v: SCALE * v, z)
                return jnp.sum(jnp.abs(y))
            return run
        nplanes, shape = 2, (B, N, N)
        rng = np.random.default_rng(0)
        args = tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                     for _ in range(nplanes))
        return chain, args
    elif variant == "ctrl":
        step = _pallas_copy((1, N, 512), lambda g: (g // gc, 0, g % gc),
                            (B * gc,))
        nplanes, shape = 2, (B, N, N)
    elif variant == "fullrow":
        step = _pallas_copy((1, N, N), lambda g: (g, 0, 0), (B,))
        nplanes, shape = 2, (B, N, N)
    elif variant == "batch4":
        step = _pallas_copy((4, N, 512), lambda g: (g // gc, 0, g % gc),
                            ((B // 4) * gc,))
        nplanes, shape = 2, (B, N, N)
    elif variant == "gorder":
        step = _pallas_copy((1, N, 512), lambda g: (g % B, 0, g // B),
                            (B * gc,))
        nplanes, shape = 2, (B, N, N)
    elif variant == "flat2d":
        rows = B * N
        spec = pl.BlockSpec((2048, 512), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

        def body(xr, xi, or_, oi_):
            or_[:] = SCALE * xr[:]
            oi_[:] = SCALE * xi[:]

        call = pl.pallas_call(
            body, grid=(rows // 2048, N // 512),
            out_shape=(jax.ShapeDtypeStruct((rows, N), jnp.float32),) * 2,
            in_specs=[spec, spec], out_specs=(spec, spec),
            compiler_params=_cp(), interpret=INTERP)

        def step(c):
            return call(*c)
        nplanes, shape = 2, (B * N, N)
    elif variant == "alias":
        step = _pallas_copy((1, N, 512), lambda g: (g // gc, 0, g % gc),
                            (B * gc,), alias=True)
        nplanes, shape = 2, (B, N, N)
    elif variant.startswith("alias") and variant[5:].isdigit():
        # aliased copy at other lane tiles: how deep does the DMA pipeline
        # need to be once the hidden carry copy is gone?
        tl2 = int(variant[5:])
        gc2 = pl.cdiv(N, tl2)
        step = _pallas_copy((1, N, tl2), lambda g: (g // gc2, 0, g % gc2),
                            (B * gc2,), alias=True)
        nplanes, shape = 2, (B, N, N)
    elif variant == "alias_fullrow":
        step = _pallas_copy((1, N, N), lambda g: (g, 0, 0), (B,), alias=True)
        nplanes, shape = 2, (B, N, N)
    elif variant == "alias_batch4":
        step = _pallas_copy((4, N, 512), lambda g: (g // gc, 0, g % gc),
                            ((B // 4) * gc,), alias=True)
        nplanes, shape = 2, (B, N, N)
    elif variant == "alias_sub":
        # sublane-blocked aliased copy: (1, 256, N) blocks — row-major
        # contiguous HBM stripes instead of lane-tile columns
        step = _pallas_copy((1, 256, N), lambda g: (g // 4, g % 4, 0),
                            (B * 4,), alias=True)
        nplanes, shape = 2, (B, N, N)
    elif variant == "merged":
        step = _pallas_copy((1, 2 * N, 512), lambda g: (g // gc, 0, g % gc),
                            (B * gc,), merged=True)
        nplanes, shape = 1, (B, 2 * N, N)
    elif variant.startswith("pipe"):
        # manual emit_pipeline copy (optionally aliased): deeper manual
        # control of the DMA pipeline than the pallas_call double-buffer
        alias = variant.endswith("a")

        def outer(xr_hbm, xi_hbm, or_hbm, oi_hbm):
            def inner(xr, xi, or_, oi_):
                or_[:] = SCALE * xr[:]
                oi_[:] = SCALE * xi[:]

            pltpu.emit_pipeline(
                inner,
                grid=(B * gc,),
                in_specs=[pl.BlockSpec((1, N, 512),
                                       lambda g: (g // gc, 0, g % gc))] * 2,
                out_specs=[pl.BlockSpec((1, N, 512),
                                        lambda g: (g // gc, 0, g % gc))] * 2,
            )(xr_hbm, xi_hbm, or_hbm, oi_hbm)

        kw2 = dict(
            out_shape=(jax.ShapeDtypeStruct((B, N, N), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
            compiler_params=_cp(), interpret=INTERP)
        if alias:
            kw2["input_output_aliases"] = {0: 0, 1: 1}
        call = pl.pallas_call(outer, **kw2)

        def step(c):
            return call(*c)
        nplanes, shape = 2, (B, N, N)
    else:
        raise SystemExit(f"unknown variant {variant}")

    rng = np.random.default_rng(0)
    args = tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                 for _ in range(nplanes))

    def chain(K):
        @jax.jit
        def run(c):
            y = jax.lax.fori_loop(0, K, lambda _, v: step(v), c)
            return sum(jnp.sum(jnp.abs(p)) for p in y)
        return run
    return chain, args


def timed(call, args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(variant):
    K1, K2 = 34, 134
    print(f"# building {variant} at {time.strftime('%H:%M:%S')}",
          file=sys.stderr, flush=True)
    try:
        chain, args = build(variant)
        c1, c2 = chain(K1), chain(K2)
        probe = float(c1(args))
        assert math.isfinite(probe), probe
        float(c2(args))
        t1, t2 = timed(c1, args), timed(c2, args)
    except Exception as e:  # a variant failing to compile is a finding too
        row = {"variant": variant, "error": repr(e)[:200]}
        print(json.dumps(row), flush=True)
        return row
    t_iter = (t2 - t1) / (K2 - K1)
    row = {
        "variant": variant, "n": N, "B": B,
        "us_per_transform": round(t_iter / B * 1e6, 2),
        "gbps": round(BYTES_PER_ITER / t_iter / 1e9, 1),
        "us_k34_apparent": round(t1 / (K1 * B) * 1e6, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    variants = ONLY or ["ctrl", "xla", "xla_c64", "fullrow", "batch4",
                        "gorder", "flat2d", "alias", "merged", "pipe4"]
    # round-4 second wave: `--only wave2`
    if ONLY == ["wave2"]:
        variants = ["xlabar", "xlabar_c64", "alias", "alias256", "alias128",
                    "alias_fullrow", "alias_batch4", "alias_sub", "pipe4",
                    "pipe4a"]
    rows = []
    rows.append(measure("ctrl"))
    for v in variants:
        if v == "ctrl":
            continue
        rows.append(measure(v))
        # re-time the control mid-sweep so drift is visible
        if v == variants[len(variants) // 2]:
            r = measure("ctrl")
            r["note"] = "mid-sweep control"
            rows.append(r)
    r = measure("ctrl")
    r["note"] = "post-sweep control"
    rows.append(r)
    if OUT:
        with open(OUT, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
