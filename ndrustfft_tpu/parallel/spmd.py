"""GSPMD-native ``_par`` under jit — the reference's "same call, parallel
execution" contract (src/lib.rs:169-238) honored INSIDE a user ``jax.jit``.

Eagerly, the ``_par`` twins inspect the committed sharding of their input
and route mesh-sharded arrays through the pencil path (api._make_par).
Inside a user jit the argument is a tracer with no committed sharding, so
through round 4 the serial impl ran and GSPMD partitioned it with its own
collectives — typically sharding a stage-dot contraction dim and
all-reducing partial products, a far wire-heavier schedule than one
all_to_all axis rotation (round-4 verdict weak #3).

This module closes that seam with ``jax.experimental.custom_partitioning``:
each ``_par`` call traced inside jit lowers to a custom-call whose
partition rule implements the pencil hop *through the SPMD partitioner
itself*:

- the partition callback requests the input re-sharded so the transform
  axis is chip-LOCAL, its mesh axis moved onto another array dim (the
  same rotation :func:`parallel.pencil.plan_pencil` performs) — the
  partitioner realizes the move as ONE tiled ``all-to-all`` over ICI,
  never an all-gather (pinned by tests/test_par_spmd.py);
- the per-shard lowering runs the ordinary serial impl on the local
  block, keeping every Pallas kernel route;
- same-shape transforms declare a sharding-PRESERVING contract (the
  Shardy rule maps each dim's factor through), so the output is restored
  to the caller's sharding with a second tiled all-to-all — under jit a
  ``_par`` call is sharding-transparent, composable along any axis order.
  The shape-changing kinds (r2c/c2r: n <-> m = n//2+1 on the transform
  axis) cannot reuse the input dim's factor; their transformed-axis
  factor is fresh, which Shardy resolves as replicated — correct, and
  still strictly cheaper than GSPMD's serial treatment (local compute is
  1/k of the replicated-compute fallback), but multi-axis real pipelines
  inside jit should prefer :func:`parallel.pencil.rfftn_pencil` (one
  all_to_all per hop, no replication).

Autodiff: ``custom_partitioning`` has no differentiation rule, so every
call is wrapped in the library's engine-tangent ``custom_jvp`` (the
api._diffable pattern): the primal keeps the partitioned fast path, the
tangent/adjoint run the pure-lax engine twin under GSPMD.
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

_SHAPE_CHANGING = ("r2c", "c2r")


def _install_cp_batching_rule():
    """Give ``custom_partitioning`` a vmap fallback.

    This jax build has no batching rule for the custom_partitioning
    primitive, so ``vmap(jit(ndfft_par))`` — vmap OUTSIDE the jit, where
    _make_par's BatchTracer fallback cannot see it — raised
    NotImplementedError. The registered rule simply vmaps the op's inner
    jaxpr (the unpartitioned semantics): partitioning is lost under the
    batch, exactly matching the documented vmap-inside-jit fallback,
    instead of erroring. Registered once at module import; a future jax
    that ships its own rule wins (we never overwrite an existing one).
    """
    try:
        from jax._src import core as _core
        from jax._src.custom_partitioning import custom_partitioning_p
        from jax._src.interpreters import batching
    except ImportError:  # pragma: no cover - jax internals moved
        return
    try:
        batching.primitive_batchers[custom_partitioning_p]
        return  # jax grew its own rule: keep it
    except (KeyError, TypeError):
        pass

    def _cp_batcher(args, dims, *, call, **params):
        def inner(*a):
            return _core.jaxpr_as_fun(call)(*a)

        in_axes = tuple(None if d is batching.not_mapped else d
                        for d in dims)
        out = jax.vmap(inner, in_axes=in_axes, out_axes=0)(*args)
        return out, (0,) * len(out)

    batching.primitive_batchers[custom_partitioning_p] = _cp_batcher


_install_cp_batching_rule()


def _norm_spec(spec, ndim):
    parts = list(spec) if spec is not None else []
    return parts + [None] * (ndim - len(parts))


def _rotate_spec(spec, axis):
    """Move the transform axis's mesh name(s) onto a local dim.

    Returns (rotated_spec, moved). Preference mirrors plan_pencil: any
    local dim, scanning from the minor end (minor dims are the largest
    post-rotation lanes); if every other dim is named (a fully-sharded
    mesh), the name joins the minor-most other dim's name tuple —
    ``P(None, ('z', 'y'))``-style combined sharding."""
    spec = list(spec)
    names = spec[axis]
    if names is None:
        return spec, False
    spec[axis] = None
    if len(spec) == 1:
        # a single sharded vector has no dim to receive the shard:
        # replicate (the unavoidable gather; the eager pencil path
        # raises for this shape for the same reason)
        return spec, True
    for d in range(len(spec) - 1, -1, -1):
        if d != axis and spec[d] is None:
            spec[d] = names
            return spec, True
    d = len(spec) - 1 if axis != len(spec) - 1 else len(spec) - 2
    cur, nm = spec[d], names
    cur_t = (cur,) if isinstance(cur, str) else tuple(cur)
    nm_t = (nm,) if isinstance(nm, str) else tuple(nm)
    spec[d] = cur_t + nm_t
    return spec, True


@lru_cache(maxsize=4096)
def _par_spmd_fn(kind, handler, axis, shape, dtype, cfg_key):
    """The custom_partitioning-wrapped serial impl for one (kind, handler,
    axis, global shape/dtype) site; returns ``(cp, consts)`` to be called
    as ``cp(x, *consts)``. cfg_key invalidates on runtime-config toggles
    exactly like api._jitted.

    custom_partitioning forbids closure constants in the traced body
    (``assert not len(consts)``), and every engine/kernel lowering here
    bakes twiddle/weight tables in as constants — so the body is traced
    to a jaxpr once, its constvars LIFTED into explicit operands
    (replicated in the partition rule: weight tables are per-chip state
    anyway), and the cp body just evaluates the lifted jaxpr."""
    from jax._src import core as _core
    from jax._src.interpreters import partial_eval as _pe
    from jax.experimental.custom_partitioning import (
        ArrayMapping, SdyShardingRule, custom_partitioning,
    )

    from ..api import _IMPLS

    impl = _IMPLS[kind]
    ndim = len(shape)

    closed = jax.make_jaxpr(lambda v: impl(v, handler, axis))(
        jax.ShapeDtypeStruct(shape, dtype))
    consts = tuple(closed.consts)
    lifted = _pe.convert_constvars_jaxpr(closed.jaxpr)  # invars: consts + x

    def body(x, *cs):
        (out,) = _core.eval_jaxpr(lifted, (), *cs, x)
        return out

    cp = custom_partitioning(body)

    def _rot(arg_shapes):
        s = arg_shapes[0].sharding
        spec = _norm_spec(getattr(s, "spec", None), ndim)
        rspec, _ = _rotate_spec(spec, axis)
        return NamedSharding(s.mesh, P(*rspec))

    def partition(mesh, arg_shapes, result_shape):
        ns = _rot(arg_shapes)
        reps = tuple(NamedSharding(ns.mesh, P())
                     for _ in range(len(arg_shapes) - 1))

        def lower_fn(x, *cs):
            # local block with the transform axis full: the ordinary
            # serial impl applies, kernel routes intact. Constants are
            # re-derived at the LOCAL shape (the lifted ones were traced
            # at the global shape); closure constants are legal here.
            return impl(x, handler, axis)

        return mesh, lower_fn, ns, (ns,) + reps

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        # non-Shardy (GSPMD-callback) path: the op computes with the
        # transform axis local; propagation offers that sharding onward
        return _rot(arg_shapes)

    def propagate_user_sharding(mesh, user_shape):
        return user_shape.sharding

    # Shardy rule: factor-through on every dim of x (sharding-preserving);
    # the r2c/c2r transformed axis changes length so its result factor
    # must be fresh (see module docstring for the consequence); each
    # lifted constant gets its own unconstrained factors (replicated).
    inf = [f"i{k}" for k in range(ndim)]
    outf = list(inf)
    if kind in _SHAPE_CHANGING:
        outf[axis] = "o0"
    operand_maps = [ArrayMapping(*inf)]
    for j, c in enumerate(consts):
        operand_maps.append(
            ArrayMapping(*(f"c{j}_{d}" for d in range(getattr(c, "ndim", 0)))))
    rule = SdyShardingRule(tuple(operand_maps), (ArrayMapping(*outf),))
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        propagate_user_sharding=propagate_user_sharding,
        sharding_rule=rule,
    )
    return cp, consts


def par_spmd_call(kind, x, handler, axis):
    """Apply ``kind`` along ``axis`` through the SPMD-partitioned path,
    with full AD (engine-tangent custom_jvp — see api._diffable)."""
    from ..api import _IMPLS, _config_key
    from ..config import (matmul_precision_name, pallas_override,
                          precision_override)

    axis = axis % x.ndim
    cp, consts = _par_spmd_fn(kind, handler, axis, tuple(x.shape),
                              str(x.dtype), _config_key())

    def f_cp(v):
        return cp(v, *consts)
    impl = _IMPLS[kind]
    linear = handler.norm.kind != "custom"
    prec = matmul_precision_name()

    def engine_fn(v):
        with pallas_override(False), precision_override(prec):
            return impl(v, handler, axis)

    g = jax.custom_jvp(f_cp)

    def jvp(primals, tangents):
        (v,), (t,) = primals, tangents
        # nested AD: the custom-call has no rules under a forward-mode
        # trace — run the whole nesting on the engine twin (see
        # api._diffable)
        from jax._src.interpreters import ad as _ad

        y = (engine_fn if isinstance(v, _ad.JVPTracer) else f_cp)(v)
        if linear:
            return y, engine_fn(t)
        return y, jax.jvp(engine_fn, (v,), (t,))[1]

    g.defjvp(jvp)
    return g(x)
