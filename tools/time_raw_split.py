"""Time the lane-last twostep kernel on PRE-SPLIT re/im arrays (no complex
boundary anywhere) vs through the complex API — isolates whether the
c64 <-> split-f32 conversion at the pallas operand boundary costs HBM
passes, or XLA's real(complex(r,i)) simplification removes it.

Usage: python tools/time_raw_split.py [n] [batch]
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["NDRUSTFFT_TPU_PALLAS"] = "1"

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ndrustfft_tpu.ops.engine import c2c  # noqa: E402
from ndrustfft_tpu.plan import get_c2c_plan  # noqa: E402

plan = get_c2c_plan(n, -1)
rng = np.random.default_rng(0)
rows = B * n
scale = 1.0 / math.sqrt(n)


def make(K):
    @jax.jit
    def run(r, i):
        def body(k, c):
            yr, yi = c2c(c[0], c[1], plan)
            s = scale * (1.0 + 1e-6 * jnp.float32(k))
            return (yr * s, yi * s)

        rr, ii = jax.lax.fori_loop(0, K, body, (r, i))
        return jnp.sum(jnp.abs(rr)) + jnp.sum(jnp.abs(ii))

    r = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    i = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    return lambda: float(run(r, i))


def timed(call, reps=3):
    call()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        ts.append(time.perf_counter() - t0)
    return min(ts)


c1, c2_ = make(2), make(34)
a, b = timed(c1), timed(c2_)
t = max((b - a) / (32 * B), 1e-9)
print(json.dumps({
    "variant": "twostep_raw_split", "n": n, "batch": B,
    "us_per_transform": round(t * 1e6, 2),
    "gflops": round(5.0 * n * math.log2(n) * n / t / 1e9, 1),
}))
