"""Periodic-Poisson spectral helpers shared by tests, examples and the
multi-chip certification entry point.

The reference has no analog (its users hand-compose forward / multiply /
inverse — reference examples/rfft2.rs); here the inverse-Laplacian
symbol and an analytic separable test case are one call each, so the
in-tree Poisson validations (tests/test_parallel.py, __graft_entry__.py)
cannot drift apart.
"""
from __future__ import annotations

import numpy as np


def poisson_greens(shape) -> np.ndarray:
    """Inverse-Laplacian spectral symbol G(k) = 1/|k|^2 (zero mode -> 0).

    ``shape`` is the GLOBAL real-space grid shape; the returned array has
    the rfftn spectral shape (last dim halved: ``shape[-1]//2 + 1``) on
    the integer-frequency grid ``np.fft.fftfreq(n, 1/n)``, i.e. the grid
    spacing is ``2*pi/n`` per axis. Multiply the rfftn spectrum by G to
    solve ``-lap u = f``; the k=0 mean mode is projected out.
    """
    shape = tuple(int(n) for n in shape)
    ks = [np.fft.fftfreq(n, 1.0 / n) for n in shape[:-1]]
    ks.append(np.fft.rfftfreq(shape[-1], 1.0 / shape[-1]))
    k2 = np.zeros(tuple(len(k) for k in ks))
    for d, k in enumerate(ks):
        sh = [1] * len(ks)
        sh[d] = len(k)
        k2 = k2 + (k ** 2).reshape(sh)
    G = np.zeros_like(k2)
    G[k2 > 0] = 1.0 / k2[k2 > 0]
    return G


def make_poisson_case(shape, modes):
    """Analytic separable periodic-Poisson case on the unit-frequency grid.

    Returns ``(u, f, G)`` with ``u = sin(m0*t0) * cos(m1*t1) * ...``
    (sin on axis 0, cos elsewhere; ``t_d = 2*pi*j/n_d``),
    ``f = -lap u = sum(m_d^2) * u``, and ``G = poisson_greens(shape)``
    so that ``irfftn(G * rfftn(f)) == u`` exactly in exact arithmetic.
    """
    shape = tuple(int(n) for n in shape)
    modes = tuple(int(m) for m in modes)
    if len(modes) != len(shape):
        raise ValueError(f"modes {modes} must match grid rank {len(shape)}")
    u = np.ones(())
    for d, (n, m) in enumerate(zip(shape, modes)):
        t = np.arange(n) * 2 * np.pi / n
        leg = np.sin(m * t) if d == 0 else np.cos(m * t)
        sh = [1] * len(shape)
        sh[d] = n
        u = u * leg.reshape(sh)
    f = float(sum(m * m for m in modes)) * u
    return u, f, poisson_greens(shape)
