"""The example programs double as asserted integration tests (the reference's
examples panic on mismatch, examples/fft2.rs:47-51)."""

import subprocess
import sys

import pytest

EXAMPLES = ["fft1", "fft2", "rfft2", "fft_norm", "poisson"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    r = subprocess.run(
        [sys.executable, f"examples/{name}.py"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
