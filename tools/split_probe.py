"""Kernel-level m-split A/B probe — one (family, n, msplit) per process.

The blessing authority referenced by the kernel docstrings
(ops/pallas/{dct,rfft}.py::_dct_msplit/_rfft_msplit): a per-n m=64 entry
enters `_DCT_MSPLIT_DEFAULT` / `_RFFT_MSPLIT_DEFAULT` only if its probe
beats BOTH surrounding default-split runs in the same tunnel window
(A/B/A interleave — run this three times: ms=0, ms=64, ms=0).

Unlike `bench.py --all` rows this times the KERNEL chain alone (fori_loop
of mid-kernel calls on pre-shaped arrays, scalar-readback timing per
NOTES_TPU.md), so the delta is pure kernel math, not protocol.

Usage: python tools/split_probe.py <family> <n> <msplit> [batch] [cols]
Families: dct23 (dct2+dct3 pair) | dct2 | dct3 (single legs — the
pair-attribution probes) | rfft (r2c+c2r pair) | c2c | dct4
Prints one JSON line {family, n, msplit, us_per_transform}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["NDRUSTFFT_TPU_PALLAS"] = "1"

family = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ms = int(sys.argv[3]) if len(sys.argv) > 3 else 0
B = int(sys.argv[4]) if len(sys.argv) > 4 else 4
cols = int(sys.argv[5]) if len(sys.argv) > 5 else n

os.environ["NDRUSTFFT_TPU_DCT_SPLIT"] = str(ms)
os.environ["NDRUSTFFT_TPU_RFFT_SPLIT"] = str(ms)
os.environ["NDRUSTFFT_TPU_MID_SPLIT"] = str(ms)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import per_transform  # noqa: E402

rng = np.random.default_rng(0)
x = rng.standard_normal((B, n, cols)).astype(np.float32)

if family == "dct23":
    from ndrustfft_tpu.ops.pallas.dct import dct2_pallas_mid, dct3_pallas_mid

    drift = float(2.0 * 1.001 / n)
    step = lambda v: dct3_pallas_mid(dct2_pallas_mid(v), scale=drift)  # noqa: E731
    per_iter = 2 * B
elif family == "dct2":
    from ndrustfft_tpu.ops.pallas.dct import dct2_pallas_mid

    # magnitude-neutral scale: one unnormalized DCT grows random-data
    # norms ~sqrt(n/2) per application, so a bare 1.001 overflows f32
    # ~23 iterations into the chain; sqrt(2/n) holds magnitudes flat
    # (same contract as the paired families' drift=2*1.001/n)
    drift = float(1.001 * (2.0 / n) ** 0.5)
    step = lambda v: dct2_pallas_mid(v, scale=drift)  # noqa: E731
    per_iter = B
elif family == "dct3":
    from ndrustfft_tpu.ops.pallas.dct import dct3_pallas_mid

    drift = float(1.001 * (2.0 / n) ** 0.5)
    step = lambda v: dct3_pallas_mid(v, scale=drift)  # noqa: E731
    per_iter = B
elif family == "dct4":
    from ndrustfft_tpu.ops.pallas.dct import dct4_pallas_mid

    drift = float(2.0 * 1.001 / n)
    step = lambda v: dct4_pallas_mid(dct4_pallas_mid(v), scale=drift)  # noqa: E731
    per_iter = 2 * B
elif family == "rfft":
    from ndrustfft_tpu.ops.pallas.rfft import c2r_pallas_mid, r2c_pallas_mid
    from ndrustfft_tpu.plan import get_r2c_plan

    plan = get_r2c_plan(n)
    drift = float(1.001 / n)

    def step(v):
        sr, si = r2c_pallas_mid(v, plan)
        return c2r_pallas_mid(sr, si, n, scale=drift)

    per_iter = 2 * B
elif family == "c2c":
    from ndrustfft_tpu.ops.pallas.fft import c2c_pallas_axis_mid
    from ndrustfft_tpu.plan import get_c2c_plan

    plan = get_c2c_plan(n, +1)
    drift = float(1.001 / n)
    xi = rng.standard_normal((B, n, cols)).astype(np.float32)

    def stepc(r, i):
        return c2c_pallas_axis_mid(r, i, plan, scale=drift)

    t = per_transform(lambda v: jnp.stack(stepc(v[0], v[1])),
                      np.stack([x, xi]), scale=None, per_iter=B)
    print(json.dumps({"family": family, "n": n, "msplit": ms,
                      "us_per_transform": round(t * 1e6, 2)}))
    sys.exit(0)
else:
    sys.exit(f"unknown family {family}")

t = per_transform(step, x, scale=None, per_iter=per_iter)
print(json.dumps({"family": family, "n": n, "msplit": ms,
                  "us_per_transform": round(t * 1e6, 2)}))
