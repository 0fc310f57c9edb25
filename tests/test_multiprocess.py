"""Multi-process runtime test (round-3 verdict next #4).

Launches REAL worker processes (subprocesses of this test) that form a
jax.distributed multi-process CPU runtime with Gloo collectives and run
the pencil R2C forward+inverse pipeline over a global mesh spanning both
processes — so the all_to_all global transposes cross an actual process
boundary, the leg a single-process virtual mesh never exercises.

The parent test process never initializes JAX itself (dryrun_multichip's
``processes>1`` branch is pure orchestration), so this is safe to run
inside the normal pytest session.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.parametrize("processes,n_devices", [(2, 8)])
def test_cross_process_pencil_roundtrip(processes, n_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_devices, processes=processes)


def test_runtime_helpers_importable():
    """The runtime module must not touch JAX at import time (it has to be
    importable before jax.distributed.initialize)."""
    import importlib

    mod = importlib.import_module("ndrustfft_tpu.parallel.runtime")
    assert hasattr(mod, "initialize") and hasattr(mod, "global_mesh")
