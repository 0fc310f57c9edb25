"""Real-toolchain compile probes for every Pallas kernel flavor.

Round-1 verdict #7: real-TPU kernel verification must be an in-tree,
re-runnable artifact, not a commit-message claim. ``bench.py
--compile-check`` (or ``python -m ndrustfft_tpu.ops.pallas.probe``) AOT
lowers + compiles every kernel flavor x dot mode on the CURRENT default
backend and prints a pass/fail matrix. Compile-only probing works through
the AOT service even while remote execution is wedged (NOTES_TPU.md), and a
Mosaic regression (new jax release, new image) fails loudly here instead of
surfacing mid-bench.

On a CPU-only host the probes run against the Pallas interpreter (still
validating tracing + shapes); the matrix notes which backend was probed.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np


def _interp() -> bool:
    """Interpreter mode off only where a real Mosaic toolchain exists."""
    import jax

    return jax.default_backend() != "tpu"


def _mk_c2c_args(n, batch):
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    return xr, xi


def _probe_lane_last(n, batch, mode):
    from ..pallas import fft as K

    run = K._build_call(n, -1, batch, "float32", _interp(), mode)
    return run, _mk_c2c_args(n, batch)


def _probe_twostep(n, batch, mode):
    from ..pallas import fft as K

    if K._twostep_split(n) is None:
        raise ValueError(f"no twostep split for n={n}")
    run = K._build_call_twostep(n, -1, batch, "float32", _interp(), mode)
    return run, _mk_c2c_args(n, batch)


def _probe_axis0(n, cols, mode):
    from ..pallas import fft as K

    run = K._build_call_axis0(n, -1, cols, "float32", _interp(), mode)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((n, cols)).astype(np.float32)
    xi = rng.standard_normal((n, cols)).astype(np.float32)
    return run, (xr, xi)


def _probe_r2c(n, batch, mode):
    from ..pallas import rfft as R

    run = R._build_r2c(n, batch, "float32", _interp(), mode)
    rng = np.random.default_rng(0)
    xe = rng.standard_normal((batch, n // 2)).astype(np.float32)
    xo = rng.standard_normal((batch, n // 2)).astype(np.float32)
    return run, (xe, xo)


def _probe_r2c_nat(n, batch, mode):
    from ..pallas import rfft as R

    run = R._build_r2c_nat(n, batch, "float32", _interp(), mode)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    return run, (x,)


def _probe_c2r_nat(n, batch, mode):
    from ..pallas import rfft as R

    run = R._build_c2r_nat(n, batch, "float32", _interp(), mode, 1.0 / n)
    rng = np.random.default_rng(0)
    m = n // 2 + 1
    sr = rng.standard_normal((batch, m)).astype(np.float32)
    si = rng.standard_normal((batch, m)).astype(np.float32)
    return run, (sr, si)


def _probe_axis_mid(n, nb, cols, mode, body="bts2"):
    from ..pallas import fft as K

    run = K._build_call_axis_mid(n, -1, nb, cols, "float32", _interp(), mode,
                                 1.0, 0, body)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, n, cols)).astype(np.float32)
    xi = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (xr, xi)


def _probe_fourstep_stage1(n1, n2, nb, mode):
    """Step-1 of the four-step long transform: axis-mid body with the fused
    inter-stage twiddle (four_n)."""
    from ..pallas import fft as K

    run = K._build_call_axis_mid(n1, -1, nb, n2, "float32", _interp(), mode,
                                 1.0, 0, "bts2", four_n=n1 * n2)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, n1, n2)).astype(np.float32)
    xi = rng.standard_normal((nb, n1, n2)).astype(np.float32)
    return run, (xr, xi)


def _probe_lane_store_t(n2, rows, nb, mode):
    """Four-step step-3+4: lane FFT with transposed store."""
    from ..pallas import fft as K

    run = K._build_call_lane_store_t(n2, -1, nb, rows, "float32", _interp(),
                                     mode)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, rows, n2)).astype(np.float32)
    xi = rng.standard_normal((nb, rows, n2)).astype(np.float32)
    return run, (xr, xi)


def _probe_blue_mid(n, nb, cols, mode):
    from ..pallas import fft as K

    run = K._build_call_axis_mid_blue(n, -1, nb, cols, "float32", _interp(),
                                      mode)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, n, cols)).astype(np.float32)
    xi = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (xr, xi)


def _probe_dct2(n, batch, mode):
    from ..pallas import dct as D

    run = D._build_dct2(n, batch, "float32", _interp(), mode, 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    return run, (x,)


def _probe_dct3(n, batch, mode):
    from ..pallas import dct as D

    run = D._build_dct3(n, batch, "float32", _interp(), mode, 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    return run, (x,)


def _probe_r2c_mid(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_r2c_mid(n, nb, cols, "float32", _interp(), mode)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_c2r_mid(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_c2r_mid(n, nb, cols, "float32", _interp(), mode, 1.0 / n)
    rng = np.random.default_rng(0)
    m = n // 2 + 1
    sr = rng.standard_normal((nb, m, cols)).astype(np.float32)
    si = rng.standard_normal((nb, m, cols)).astype(np.float32)
    return run, (sr, si)


def _probe_r2c_packed_mid(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_r2c_packed_mid(n, nb, cols, "float32", _interp(), mode,
                                  1.0)
    rng = np.random.default_rng(0)
    h = n // 2
    xe = rng.standard_normal((nb, h, cols)).astype(np.float32)
    xo = rng.standard_normal((nb, h, cols)).astype(np.float32)
    return run, (xe, xo)


def _probe_dct1_mid(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_dct1_mid(n, nb, cols, "float32", _interp(), mode, 1.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x, x[:, ::-1, :].copy())


def _probe_dct_dense(n, nb, cols, mode):
    from ..pallas import dct as D

    run = D._build_dct_dense_mid(n, 1, nb, cols, "float32", _interp(), mode,
                                 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_r2c_dense(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_r2c_dense_mid(n, nb, cols, "float32", _interp(), mode)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_c2r_dense(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_c2r_dense_mid(n, nb, cols, "float32", _interp(), mode,
                                 1.0 / n)
    rng = np.random.default_rng(0)
    m = n // 2 + 1
    sr = rng.standard_normal((nb, m, cols)).astype(np.float32)
    si = rng.standard_normal((nb, m, cols)).astype(np.float32)
    return run, (sr, si)


def _probe_dct2_mid(n, nb, cols, mode):
    from ..pallas import dct as D

    run = D._build_dct2_mid(n, nb, cols, "float32", _interp(), mode, 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_blue_rr(n, variant, nb, cols, mode):
    from ..pallas import fft as K

    run = K._build_call_axis_mid_blue_rr(n, nb, cols, "float32", _interp(),
                                         mode, f"dct{variant}", 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_dct2_mid_m64(n, nb, cols, mode):
    from ..pallas import dct as D

    run = D._build_dct2_mid(n, nb, cols, "float32", _interp(), mode, 2.0,
                            msplit=64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_r2c_mid_m64(n, nb, cols, mode):
    from ..pallas import rfft as R

    run = R._build_r2c_mid(n, nb, cols, "float32", _interp(), mode,
                           msplit=64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_spectral_mid(n, nb, cols, mode, msplit=0):
    """Fused r2c -> multiply -> c2r pipeline kernel (round 5)."""
    from ..pallas import rfft as R

    run = R._build_spectral_mid(n, nb, cols, "float32", _interp(), mode,
                                1.0 / n, msplit=msplit)
    rng = np.random.default_rng(0)
    m = n // 2 + 1
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    hr = rng.standard_normal((m, 1)).astype(np.float32)
    hi = rng.standard_normal((m, 1)).astype(np.float32)
    return run, (x, hr, hi)


def _probe_spectral_c2c_mid(n, nb, cols, mode, msplit=0):
    """Fused fft -> multiply -> ifft pipeline kernel (round 5)."""
    from ..pallas import fft as K

    run = K._build_spectral_c2c_mid(n, nb, cols, "float32", _interp(), mode,
                                    1.0 / n, mid_split=msplit)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((nb, n, cols)).astype(np.float32)
    xi = rng.standard_normal((nb, n, cols)).astype(np.float32)
    hr = rng.standard_normal((n, 1)).astype(np.float32)
    hi = rng.standard_normal((n, 1)).astype(np.float32)
    return run, (xr, xi, hr, hi)


def _probe_spectral_dct_mid(n, nb, cols, mode, msplit=0):
    """Fused dct2 -> multiply -> dct3 pipeline kernel (round 5)."""
    from ..pallas import dct as D

    run = D._build_spectral_dct_mid(n, nb, cols, "float32", _interp(), mode,
                                    1.0, 2.0 / n, msplit=msplit)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    hv = rng.standard_normal((n, 1)).astype(np.float32)
    return run, (x, hv)


def _probe_dct3_mid(n, nb, cols, mode):
    from ..pallas import dct as D

    run = D._build_dct3_mid(n, nb, cols, "float32", _interp(), mode, 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


def _probe_dct4_mid(n, nb, cols, mode):
    from ..pallas import dct as D

    run = D._build_dct4_mid(n, nb, cols, "float32", _interp(), mode, 2.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nb, n, cols)).astype(np.float32)
    return run, (x,)


# (label, builder, kwargs). n=1024 is the headline shape; n=264 covers the
# non-power-of-two mixed-radix path; n=128 the dense single-matmul path.
PROBES = [
    ("lane_last n=1024", _probe_lane_last, dict(n=1024, batch=256)),
    ("lane_last n=264", _probe_lane_last, dict(n=264, batch=256)),
    ("lane_last n=128 dense", _probe_lane_last, dict(n=128, batch=256)),
    ("twostep   n=1024", _probe_twostep, dict(n=1024, batch=256)),
    ("twostep   n=512", _probe_twostep, dict(n=512, batch=256)),
    # Bluestein sub-FFT length for the odd dct2d bench twin (2049 ->
    # M=4608 via plan.blue_sub_len): the lane-last leg rides this twostep
    # shape instead of the generic body's 781 s Mosaic compile pathology
    ("twostep   n=4608 blueM", _probe_twostep, dict(n=4608, batch=256)),
    ("axis0     n=1024", _probe_axis0, dict(n=1024, cols=256)),
    ("axis0     n=264", _probe_axis0, dict(n=264, cols=256)),
    # non-128-multiple cols through the axis0 cols-granule clamp: the
    # oversized single block (384-over-264) and a partial last block
    # (256-tile grid over 200) must compile on real Mosaic too
    ("axis0     n=264 c264", _probe_axis0, dict(n=264, cols=264)),
    ("axis0     n=1024 c200", _probe_axis0, dict(n=1024, cols=200)),
    ("r2c_packed n=1024", _probe_r2c, dict(n=1024, batch=256)),
    ("r2c_nat   n=1024", _probe_r2c_nat, dict(n=1024, batch=256)),
    ("c2r_nat   n=1024", _probe_c2r_nat, dict(n=1024, batch=256)),
    ("axis_mid  n=1024", _probe_axis_mid, dict(n=1024, nb=4, cols=256)),
    ("axis_mid  n=1024 ts", _probe_axis_mid,
     dict(n=1024, nb=4, cols=256, body="ts")),
    ("axis_mid  n=264", _probe_axis_mid, dict(n=264, nb=4, cols=256)),
    # the exact fft2d_264 bench shape: dense body, 384-lane single block
    # (the _mid_tile cols-granule clamp) oversized by 120 over cols=264
    ("axis_mid  n=264 c264", _probe_axis_mid, dict(n=264, nb=4, cols=264)),
    ("axis_mid  n=128 dense", _probe_axis_mid, dict(n=128, nb=4, cols=256)),
    # non-128-multiple column extents (partial/oversized lane blocks) must
    # compile on real Mosaic, not just interpret mode (ADVICE r2)
    ("axis_mid  n=1024 c200", _probe_axis_mid,
     dict(n=1024, nb=4, cols=200)),
    ("axis_mid  n=128 c200", _probe_axis_mid, dict(n=128, nb=4, cols=200)),
    ("fourstep  1024x1024", _probe_fourstep_stage1,
     dict(n1=1024, n2=1024, nb=1)),
    ("lane_store_t 256x512", _probe_lane_store_t,
     dict(n2=256, rows=512, nb=2)),
    ("fourstep  512x256", _probe_fourstep_stage1,
     dict(n1=512, n2=256, nb=2)),
    ("blue_mid  n=509", _probe_blue_mid, dict(n=509, nb=4, cols=256)),
    ("blue_mid  n=127 dense", _probe_blue_mid, dict(n=127, nb=4, cols=256)),
    ("blue_mid  n=2053 ts", _probe_blue_mid, dict(n=2053, nb=2, cols=256)),
    # largest M the _BLUE_LIVE_COPIES VMEM budget admits (M=13568): the
    # eligibility bound is only honest if this extreme compiles on real
    # Mosaic (ADVICE r2 pattern: probe the boundary, not just the interior)
    ("blue_mid  n=6761 Mcap", _probe_blue_mid, dict(n=6761, nb=1, cols=128)),
    ("blue_mid  n=509 c200", _probe_blue_mid, dict(n=509, nb=4, cols=200)),
    # the exact prime-bench shape (cols=n) rides the new 512-lane tile
    # (live-copy VMEM budget, fft.py:_build_call_axis_mid_blue): compile
    # the oversized-by-3 block on real Mosaic, not just interpret
    ("blue_mid  n=509 c509", _probe_blue_mid, dict(n=509, nb=2, cols=509)),
    # real-to-real fused chirp-z (Makhoul DCT-II/III at Bluestein sizes):
    # the exact dct2d_23_2049 bench shape's kernel, both variants
    ("blue_rr2  n=2049", _probe_blue_rr, dict(n=2049, variant=2, nb=1,
                                              cols=256)),
    ("blue_rr3  n=2049", _probe_blue_rr, dict(n=2049, variant=3, nb=1,
                                              cols=256)),
    ("dct2      n=1024", _probe_dct2, dict(n=1024, batch=256)),
    ("dct3      n=1024", _probe_dct3, dict(n=1024, batch=256)),
    ("r2c_mid   n=1024", _probe_r2c_mid, dict(n=1024, nb=4, cols=256)),
    ("c2r_mid   n=1024", _probe_c2r_mid, dict(n=1024, nb=4, cols=256)),
    ("dct2_mid  n=1024", _probe_dct2_mid, dict(n=1024, nb=4, cols=256)),
    ("dct3_mid  n=1024", _probe_dct3_mid, dict(n=1024, nb=4, cols=256)),
    # fused spectral pipelines (round 5): bench shapes + the m=64 split
    ("specc2c_mid n=1024", _probe_spectral_c2c_mid,
     dict(n=1024, nb=4, cols=256)),
    ("spec_mid  n=1024", _probe_spectral_mid, dict(n=1024, nb=4, cols=256)),
    ("spec_mid  n=1024 m64", _probe_spectral_mid,
     dict(n=1024, nb=4, cols=256, msplit=64)),
    ("specdct_mid n=1024", _probe_spectral_dct_mid,
     dict(n=1024, nb=4, cols=256)),
    ("specdct_mid n=1024 m64", _probe_spectral_dct_mid,
     dict(n=1024, nb=4, cols=256, msplit=64)),
    # the m=64 split on the existing kernels (blessing candidates)
    ("dct2_mid  n=1024 m64", _probe_dct2_mid_m64,
     dict(n=1024, nb=4, cols=256)),
    ("r2c_mid   n=1024 m64", _probe_r2c_mid_m64,
     dict(n=1024, nb=4, cols=256)),
    # the fully fused 4-pipeline DCT-IV (bench shape + partial-lane-block
    # boundary)
    ("dct4_mid  n=2048", _probe_dct4_mid, dict(n=2048, nb=4, cols=256)),
    ("dct4_mid  n=2048 c200", _probe_dct4_mid, dict(n=2048, nb=4,
                                                    cols=200)),
    ("r2c_mid   n=1024 c200", _probe_r2c_mid, dict(n=1024, nb=4, cols=200)),
    ("c2r_mid   n=1024 c200", _probe_c2r_mid, dict(n=1024, nb=4, cols=200)),
    ("dct2_mid  n=1024 c200", _probe_dct2_mid, dict(n=1024, nb=4, cols=200)),
    ("r2c_pk_mid n=2048", _probe_r2c_packed_mid, dict(n=2048, nb=4, cols=256)),
    ("dct1_mid  n=2049", _probe_dct1_mid, dict(n=2049, nb=2, cols=256)),
    ("dct1_mid  n=2049 c200", _probe_dct1_mid, dict(n=2049, nb=2, cols=200)),
    ("dct_dense n=1025", _probe_dct_dense, dict(n=1025, nb=2, cols=256)),
    ("dct_dense n=1025 c200", _probe_dct_dense,
     dict(n=1025, nb=2, cols=200)),
    ("r2c_dense n=264", _probe_r2c_dense, dict(n=264, nb=4, cols=256)),
    ("c2r_dense n=264", _probe_c2r_dense, dict(n=264, nb=4, cols=256)),
]

MODES = ["bf16x3", "highest", "default"]


def _compile_one(builder, kwargs, mode):
    import jax

    run, args = builder(mode=mode, **kwargs)
    jax.jit(run).lower(*args).compile()


def run(verbose: bool = True, modes=None, probes=None) -> bool:
    """Compile the probe matrix; return True iff everything passes.

    Each row also records its wall-clock compile seconds (round-5 verdict
    next #8: Mosaic compile latency is a serving-relevant cost — 20-40 s
    per big kernel on the real toolchain — so the matrix carries the
    per-kernel numbers; the cold/warm serving recipe is
    ``handler.warmup()`` + ``utils.cache.enable_persistent_cache``,
    measured in tools/compile_latency.py)."""
    import time as _time

    import jax

    backend = jax.default_backend()
    results = []
    ok_all = True
    for label, builder, kwargs in (probes or PROBES):
        for mode in (modes or MODES):
            t0 = _time.perf_counter()
            try:
                _compile_one(builder, kwargs, mode)
                dt = _time.perf_counter() - t0
                results.append((label, mode, "PASS", "", dt))
            except Exception as e:  # noqa: BLE001
                ok_all = False
                dt = _time.perf_counter() - t0
                msg = f"{type(e).__name__}: {e}"
                results.append((label, mode, "FAIL",
                                msg.splitlines()[0][:100], dt))
                if verbose:
                    traceback.print_exc(limit=2, file=sys.stderr)
    if verbose:
        print(f"# kernel compile probe on backend={backend}")
        for label, mode, status, msg, dt in results:
            line = f"{status}  {label:24s} {mode:8s} {dt:7.2f}s"
            if msg:
                line += f"  {msg}"
            print(line)
        n_pass = sum(1 for r in results if r[2] == "PASS")
        total = sum(r[4] for r in results)
        print(f"# {n_pass}/{len(results)} passed, "
              f"total compile {total:.1f}s")
    return ok_all


if __name__ == "__main__":
    sys.exit(0 if run(verbose=True) else 1)
