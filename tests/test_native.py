"""Native C++ planner == Python planner equivalence.

The C++ library (native/planner.cpp) is the plan-time runtime component (the
rustfft-planner analog); it must agree exactly with the pure-Python fallback
on factorization and to f64 ulp on twiddle tables.
"""

import numpy as np
import pytest

from ndrustfft_tpu import native
from ndrustfft_tpu.plan import _cis, _greedy_partition, prime_factors

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="native planner not built")


def _py_factorize(n, max_base):
    # the Python algorithm, bypassing the native fast path in plan.factorize
    if n == 1:
        return (1,)
    pf = prime_factors(n)
    if max(pf) > max_base:
        return None
    k = 1
    while max_base**k < n:
        k += 1
    while True:
        parts = _greedy_partition(pf, k, max_base)
        if parts is not None:
            return tuple(sorted(parts, reverse=True))
        k += 1


@pytest.mark.parametrize("max_base", [16, 64, 128])
def test_factorize_matches_python(max_base):
    for n in list(range(1, 300)) + [512, 1024, 4096, 3 * 5 * 7 * 11,
                                    2 * 127 * 127, 997, 1 << 16]:
        got = native.factorize_native(n, max_base)
        want = _py_factorize(n, max_base)
        assert got == want, (n, max_base, got, want)
        if got is not None:
            assert int(np.prod(got)) == n
            assert all(f <= max_base for f in got)


def test_twiddles_match_python():
    for f, m in [(4, 8), (32, 32), (7, 13), (128, 8)]:
        nre, nim = native.stage_twiddle_native(f, m, -1)
        jp = np.outer(np.arange(f, dtype=np.int64), np.arange(m, dtype=np.int64))
        pre, pim = _cis(2 * jp, f * m, -1)
        np.testing.assert_allclose(nre, pre, atol=1e-15)
        np.testing.assert_allclose(nim, pim, atol=1e-15)


def test_dft_matrix_matches_python():
    for f in [2, 3, 16, 127]:
        for sign in (-1, 1):
            nre, nim = native.dft_matrix_native(f, sign)
            tk = np.outer(np.arange(f, dtype=np.int64), np.arange(f, dtype=np.int64))
            pre, pim = _cis(2 * tk, f, sign)
            np.testing.assert_allclose(nre, pre, atol=1e-15)
            np.testing.assert_allclose(nim, pim, atol=1e-15)


def test_chirp_matches_python():
    for n in [5, 64, 509]:
        nre, nim = native.chirp_native(n, -1, 2 * n)
        t = np.arange(2 * n, dtype=np.int64)
        pre, pim = _cis(t * t, n, -1)
        np.testing.assert_allclose(nre, pre, atol=1e-15)
        np.testing.assert_allclose(nim, pim, atol=1e-15)


def test_next_smooth_matches_python_twin():
    from ndrustfft_tpu.plan import next_smooth

    for n in list(range(1, 200)) + [729, 1023, 1025, 4097]:
        assert lib.nd_next_smooth(n) == next_smooth(n), n
