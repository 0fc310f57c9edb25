"""Profiling and roofline accounting (SURVEY.md §5 tracing/profiling).

The reference's only perf tooling is criterion wall-times; the TPU build adds
(a) a thin wrapper over the JAX profiler for trace capture and (b) a roofline
model so benchmark numbers can be reported as % of the HBM-bandwidth bound —
the driver-defined metric (BASELINE.json).
"""

from __future__ import annotations

import contextlib
import math
import time
from dataclasses import dataclass

# Published per-chip specs used for roofline accounting.
CHIP_SPECS = {
    # name: (HBM GB/s, peak f32 TFLOP/s [bf16/2 for v5e-class MXU])
    "tpu v5 lite": (819.0, 98.5),
    "tpu v5e": (819.0, 98.5),
    "tpu v4": (1228.0, 137.5),
    "tpu v5p": (2765.0, 229.5),
    "tpu v6e": (1640.0, 459.0),
    "cpu": (50.0, 1.0),
}


def chip_spec(device=None):
    import jax

    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for name, spec in CHIP_SPECS.items():
        if name in kind:
            return spec
    return CHIP_SPECS["cpu"]


@dataclass
class Roofline:
    """Roofline verdict for one transform execution."""

    seconds: float
    flops: float
    bytes: float
    hbm_gbps: float
    peak_tflops: float

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def achieved_gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    @property
    def hbm_bound_seconds(self) -> float:
        return self.bytes / (self.hbm_gbps * 1e9)

    @property
    def pct_of_hbm_roofline(self) -> float:
        """100 * (HBM-bound time / measured time)."""
        return 100.0 * self.hbm_bound_seconds / self.seconds

    def __str__(self):
        return (f"{self.gflops:.1f} GFLOP/s (5NlogN), "
                f"{self.achieved_gbps:.0f} GB/s, "
                f"{self.pct_of_hbm_roofline:.0f}% of HBM roofline")


def fft_flops(n: int, lanes: int) -> float:
    """5 N log2 N convention per lane (BASELINE.md metric)."""
    return 5.0 * n * math.log2(max(n, 2)) * lanes


def fft_bytes(n: int, lanes: int, itemsize: int, complex_io: bool = True) -> float:
    """Ideal HBM traffic: read input once + write output once."""
    per = 2 if complex_io else 1
    return 2.0 * lanes * n * itemsize * per


def measure(fn, *args, reps: int = 5, warmup: int = 2) -> float:
    """Median wall-time of fn(*args) with device sync."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def roofline_c2c(fn, x, n: int, lanes: int, reps: int = 5) -> Roofline:
    hbm, peak = chip_spec()
    secs = measure(fn, x, reps=reps)
    item = x.dtype.itemsize // (2 if "complex" in str(x.dtype) else 1)
    return Roofline(
        seconds=secs,
        flops=fft_flops(n, lanes),
        bytes=fft_bytes(n, lanes, item, complex_io=True),
        hbm_gbps=hbm,
        peak_tflops=peak,
    )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ndrustfft_tpu_trace"):
    """Capture a JAX profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
