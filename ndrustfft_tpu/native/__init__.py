"""ctypes loader for the native C++ planner (libndplanner.so).

The reference's plan-time machinery is native (rustfft's planner); ours is
planner.cpp, built lazily with g++ on first import and cached next to this
file. Every entry point has a pure-Python twin in ``plan.py`` — if the
toolchain is unavailable the framework silently falls back (tests assert
native == python when the library is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libndplanner.so")
_SRC = os.path.join(_HERE, "planner.cpp")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    # compile to a temp file and os.replace() it in (atomic on POSIX): two
    # processes building concurrently must never dlopen a half-written .so
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib():
    """The loaded CDLL, or None when native planning is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.nd_prime_factors.restype = ctypes.c_int
        lib.nd_prime_factors.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        lib.nd_factorize.restype = ctypes.c_int
        lib.nd_factorize.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        lib.nd_next_smooth.restype = ctypes.c_int64
        lib.nd_next_smooth.argtypes = [ctypes.c_int64]
        lib.nd_dft_matrix.restype = None
        lib.nd_dft_matrix.argtypes = [
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.nd_stage_twiddle.restype = None
        lib.nd_stage_twiddle.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.nd_chirp.restype = None
        lib.nd_chirp.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def factorize_native(n: int, max_base: int):
    """Balanced factorization via the C++ planner; None if lib or plan
    unavailable (prime > max_base returns the empty marker, mapped to None
    like the Python planner)."""
    lib = get_lib()
    if lib is None:
        return NotImplemented
    out = (ctypes.c_int64 * 64)()
    cnt = lib.nd_factorize(n, max_base, out, 64)
    if cnt < 0:
        raise ValueError(f"native factorize failed for n={n}")
    if cnt == 0:
        return None  # large prime -> Bluestein
    return tuple(int(out[i]) for i in range(cnt))


def dft_matrix_native(f: int, sign: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return NotImplemented
    re = np.empty((f, f), dtype=np.float64)
    im = np.empty((f, f), dtype=np.float64)
    lib.nd_dft_matrix(
        f, sign,
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return re, im


def stage_twiddle_native(f: int, m: int, sign: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return NotImplemented
    re = np.empty((f, m), dtype=np.float64)
    im = np.empty((f, m), dtype=np.float64)
    lib.nd_stage_twiddle(
        f, m, sign,
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return re, im


def chirp_native(n: int, sign: int, length: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return NotImplemented
    re = np.empty((length,), dtype=np.float64)
    im = np.empty((length,), dtype=np.float64)
    lib.nd_chirp(
        n, sign, length,
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return re, im
