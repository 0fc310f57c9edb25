"""Multi-process pencil worker: one JAX process of a multi-process run.

Launched by ``__graft_entry__.dryrun_multichip(n, processes=k)`` (and
tests/test_multiprocess.py), ``k`` processes at a time. Each process
contributes ``local_devices`` virtual CPU devices; together they form one
global mesh, and the pencil R2C forward+inverse pipeline runs ACROSS the
process boundary: the all_to_all global transposes move data between
processes — the cross-process leg the round-3 verdict flagged as never
exercised (SURVEY.md §2.3 multi-process runtime item).

Usage:
  python tools/mp_pencil_worker.py <coordinator> <num_procs> <proc_id> \
      <local_devices> <nz> <ny> <nx>

Prints one line ``MP_OK <proc_id> err=<roundtrip max err>`` on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coord, nproc, pid, local, nz, ny, nx = sys.argv[1:8]
nproc, pid, local = int(nproc), int(pid), int(local)
nz, ny, nx = int(nz), int(ny), int(nx)

from ndrustfft_tpu.parallel import runtime  # noqa: E402

runtime.initialize(coordinator_address=coord, num_processes=nproc,
                   process_id=pid, cpu_virtual_devices=local)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from ndrustfft_tpu.parallel import irfftn_pencil, rfftn_pencil  # noqa: E402

assert jax.process_count() == nproc, (jax.process_count(), nproc)
assert len(jax.devices()) == nproc * local, len(jax.devices())

mesh = runtime.global_mesh()
py, pz = mesh.devices.shape

# deterministic GLOBAL data; each process materializes only its shards
full = np.random.default_rng(0).standard_normal((nz, ny, nx)).astype(
    np.float32)
sharding = NamedSharding(mesh, P("y", "z", None))
x = jax.make_array_from_callback(
    (nz, ny, nx), sharding, lambda idx: full[idx])


def fwd_bwd(v):
    vhat, spec = rfftn_pencil(v, mesh, P("y", "z", None))
    back, _ = irfftn_pencil(vhat, mesh, spec, n_last=nx, axes=[0, 1, 2])
    return back


out = jax.jit(fwd_bwd,
              out_shardings=NamedSharding(mesh, P("y", "z", None)))(x)
out.block_until_ready()
# verify THIS process's addressable shards against the host truth
err = 0.0
for shard in out.addressable_shards:
    want = full[shard.index]
    err = max(err, float(np.max(np.abs(np.asarray(shard.data) - want))))
assert err < 1e-3, f"cross-process pencil roundtrip error {err}"
print(f"MP_OK {pid} err={err:.2e}", flush=True)
