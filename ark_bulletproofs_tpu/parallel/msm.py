"""Multi-chip sharded MSM via shard_map over a 1-D device mesh.

Strategy (SPMD, ICI-friendly): points and scalars are sharded on their
leading axis; every device runs a full single-chip MSM (ops/msm.py, or
the compile-light ops/msm_serial.py) on its local shard — bucket
accumulation is embarrassingly parallel across point shards because
group addition commutes — then the per-device Jacobian partials (one
point each, ~192 bytes) are all-gathered over ICI and tree-added on
every device. Communication is O(devices), independent of n, so scaling
is linear up to sort/compile overheads.

Two kernels, one sharding:
  * `sharded_msm_fn`       — production Pippenger per shard (fast, but
    ~10 group-law instantiations ≈ minutes of XLA compile on CPU);
  * `sharded_msm_serial_fn` — bit-serial Horner per shard (~3
    instantiations, compiles in well under a minute) for the multichip
    dryrun and the CPU-mesh test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import curve as dc
from ..ops import msm as dmsm
from ..ops import msm_serial as dmsm_serial
from .mesh import DATA_AXIS


def _reduce_partials(spec, parts):
    """Tree-add a (D, 16)-coord array of per-device partial points.

    Runs *outside* the shard_map body on the global (device-sharded)
    partials — XLA lays the D-1 adds out with its own ICI data movement,
    and the varying-manual-axes typing stays sound (a collective inside
    the body would produce a `varying` output that cannot be typed as
    replicated). One `add` instantiation (the fori body compiles once).
    """
    D = parts[0].shape[0]

    def body(i, acc):
        nxt = tuple(
            jax.lax.dynamic_index_in_dim(g, i, axis=0, keepdims=False)
            for g in parts
        )
        return dc.add(spec, acc, nxt)

    init = tuple(g[0] for g in parts)
    return jax.lax.fori_loop(1, D, body, init)


def _local_partial(spec, c, X, Y, inf, scal):
    part = dmsm.msm_impl(spec, c, X, Y, inf, scal, axis_name=DATA_AXIS)
    return tuple(coord[None] for coord in part)  # (1, 16) per device


def _local_serial_partial(spec, X, Y, inf, scal):
    part = dmsm_serial.msm_serial_impl(
        spec, X, Y, inf, scal, axis_name=DATA_AXIS
    )
    return tuple(coord[None] for coord in part)


def sharded_msm_fn(spec: dc.CurveSpec, c: int, mesh: Mesh):
    """Returns a jittable fn (X, Y, inf, scal) -> one Jacobian point.

    Inputs are global arrays with leading axis divisible by the mesh
    size; shard_map splits them across DATA_AXIS, each device runs the
    full Pippenger on its shard, and the D single-point partials are
    tree-added outside the sharded region.
    """
    local = jax.shard_map(
        partial(_local_partial, spec, c),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
    )

    def fn(X, Y, inf, scal):
        return _reduce_partials(spec, local(X, Y, inf, scal))

    return fn


def sharded_msm_serial_fn(spec: dc.CurveSpec, mesh: Mesh):
    """Compile-light sharded MSM (bit-serial Horner per shard)."""
    local = jax.shard_map(
        partial(_local_serial_partial, spec),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
    )

    def fn(X, Y, inf, scal):
        return _reduce_partials(spec, local(X, Y, inf, scal))

    return fn


_JIT_CACHE: dict = {}


def _jitted(kind: str, spec, mesh: Mesh, c: int | None = None):
    """Memoize the jitted sharded programs: repeated host-facing calls
    with the same (spec, mesh, c) reuse one PjitFunction, so equal-shape
    invocations hit the jit cache instead of re-tracing."""
    key = (kind, spec, mesh, c)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        if kind == "pippenger":
            fn = jax.jit(sharded_msm_fn(spec, c, mesh))
        else:
            fn = jax.jit(sharded_msm_serial_fn(spec, mesh))
        _JIT_CACHE[key] = fn
    return fn


def _prepare(curve, bases, scalars, mesh):
    import numpy as np

    from ..ops.limbs import ints_to_limbs

    spec = dc.spec_for(curve)
    D = mesh.devices.size
    n = len(bases)
    m = dmsm._pad_pow2(max(n, D))
    m = ((m + D - 1) // D) * D
    fr_p = curve.fr.p
    ks = [s % fr_p for s in scalars] + [0] * (m - n)
    pts = list(bases) + [None] * (m - n)
    X, Y, inf = dc.affine_to_device(curve, pts)
    scal = ints_to_limbs(ks)
    return spec, m, X, Y, np.asarray(inf), scal


def msm_sharded(curve, bases: list, scalars: list[int], mesh: Mesh):
    """Host-facing multi-chip MSM (affine int points in/out)."""
    if len(bases) == 0:
        return curve.zero()
    spec, m, X, Y, inf, scal = _prepare(curve, bases, scalars, mesh)
    c = dmsm._window_bits(m // mesh.devices.size)
    fn = _jitted("pippenger", spec, mesh, c)
    out = fn(X, Y, inf, scal)
    return dc.jacobian_to_host(curve, out)


def msm_sharded_serial(curve, bases: list, scalars: list[int], mesh: Mesh):
    """Host-facing compile-light multi-chip MSM (dryrun/test path)."""
    if len(bases) == 0:
        return curve.zero()
    spec, m, X, Y, inf, scal = _prepare(curve, bases, scalars, mesh)
    fn = _jitted("serial", spec, mesh)
    out = fn(X, Y, inf, scal)
    return dc.jacobian_to_host(curve, out)


# --- device-array variant (mega-MSM sharding for verify/batch_verify) ---


def _local_partial_arrays(spec, c, X, Y, inf, scal):
    part = dmsm.msm_impl(spec, c, X, Y, inf, scal, axis_name=DATA_AXIS)
    return tuple(coord[None] for coord in part)  # (1, [B,] 16) per device


def sharded_msm_device_fn(spec: dc.CurveSpec, c: int, mesh: Mesh):
    """Jittable (X, Y, inf, scal) -> device Jacobian point(s).

    Same contract as ops/msm.py::msm_device but sharded: the base-point
    axis is split across the mesh, every device runs the full Pippenger
    on its shard (group addition commutes, so bucket accumulation over a
    point subset is a partial sum), and the per-device partials are
    tree-added outside the sharded region. `scal` may be (n, 16) or
    (B, n, 16); the n axis is sharded either way.
    """
    local = jax.shard_map(
        partial(_local_partial_arrays, spec, c),
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(DATA_AXIS),
        ),
        out_specs=(P(DATA_AXIS),) * 3,
    )

    def fn(X, Y, inf, scal):
        return _reduce_partials(spec, local(X, Y, inf, scal))

    def fn_batched(X, Y, inf, scal):
        local_b = jax.shard_map(
            partial(_local_partial_arrays, spec, c),
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(None, DATA_AXIS),
            ),
            out_specs=(P(DATA_AXIS),) * 3,
        )
        return _reduce_partials(spec, local_b(X, Y, inf, scal))

    return fn, fn_batched


def _local_partial2(spec, c, X, Y, inf, scal):
    """Per-shard v2 mega-kernel Pippenger -> one Jacobian partial."""
    from ..ops import msm2
    from ..ops import proj as dpj

    part = dpj.to_jacobian(spec, msm2.msm2_impl(spec, c, X, Y, inf, scal))
    return tuple(coord[None] for coord in part)  # (1, [B,] 16) per device


def sharded_msm2_device_fn(spec: dc.CurveSpec, c: int, mesh: Mesh):
    """Sharded composition of the v2 fused mega-kernel (VERDICT r2 #2).

    Same contract as `sharded_msm_device_fn` but each device runs the
    Pallas mega-kernel pipeline (ops/msm2.py) on its point shard instead
    of the v1 XLA-op Pippenger — the single-chip fast path and the mesh
    path are the same kernel family, so a multi-chip slice keeps the v2
    speedup. Requires n/D to be a power of two >= msm2.C_COLS with
    c + log2(n/D) <= 32 (the packed-sort budget applies per shard).
    Returns (single_fn, batched_fn); scal (n, 16) or (B, n, 16).
    """

    # check_vma=False: the per-shard body launches Pallas kernels, whose
    # out_shape ShapeDtypeStructs carry no varying-mesh-axes annotation —
    # jax's vma typing rejects them inside a checked shard_map. The body
    # is collective-free (pure per-shard compute), so the check buys
    # nothing here.
    def fn(X, Y, inf, scal):
        local = jax.shard_map(
            partial(_local_partial2, spec, c),
            mesh=mesh,
            in_specs=(P(DATA_AXIS),) * 4,
            out_specs=(P(DATA_AXIS),) * 3,
            check_vma=False,
        )
        return _reduce_partials(spec, local(X, Y, inf, scal))

    def fn_batched(X, Y, inf, scal):
        local_b = jax.shard_map(
            partial(_local_partial2, spec, c),
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(None, DATA_AXIS)),
            out_specs=(P(DATA_AXIS),) * 3,
            check_vma=False,
        )
        return _reduce_partials(spec, local_b(X, Y, inf, scal))

    return fn, fn_batched


def _v2_shard_ok(spec, n_loc: int) -> bool:
    from ..ops import msm2

    return (
        isinstance(spec, dc.CurveSpec)
        and n_loc >= msm2.V2_MIN_N
        and (n_loc & (n_loc - 1)) == 0
    )


def msm_device_ragged(spec, X, Y, inf, scal):
    """Device MSM over an arbitrary-length base axis WITHOUT padding to
    the next power of two.

    `_pad_pow2` can double the work of the protocol's ragged mega-MSMs
    (the verifier's 2 + 2n + tails layout lands just past 2n and pads to
    4n — reference verifier.rs:574,685). Here the axis is split into its
    binary decomposition — largest power-of-two chunk first, remainder
    recursing while it stays >= _RAGGED_MIN — and the per-chunk Jacobian
    partials are added on device (group addition commutes). Each chunk
    runs the full maybe-sharded fast path; total work tracks n instead
    of pad(n). scal: (n, 16) or (B, n, 16) — the base axis is the one
    split. Returns Jacobian device point(s), (B, 16) coords if batched."""
    n = X.shape[0]

    def ssl(o, size):  # slice scal's base axis
        return scal[..., o:o + size, :]

    chunks = []
    off = 0
    while n - off >= _RAGGED_MIN:
        size = 1 << ((n - off).bit_length() - 1)
        chunks.append((off, size))
        off += size
    acc = None
    for o, size in chunks:
        part = msm_device_maybe_sharded(
            spec, dmsm._window_bits(size),
            X[o:o + size], Y[o:o + size], inf[o:o + size], ssl(o, size),
        )
        acc = part if acc is None else dc.add(spec, acc, part)
    rem = n - off
    if rem:
        m = dmsm._pad_pow2(rem)
        if chunks:
            # Clamp the tail to ONE canonical width: every ragged MSM's
            # sub-chunk remainder (the verifier tails are ~2 lg n points)
            # then shares a single compiled program (v2-eligible at
            # _RAGGED_MIN) instead of compiling a one-off tiny shape per
            # distinct tail size (~80 s of v1 XLA compile each,
            # measured).
            m = max(m, _RAGGED_MIN)
        pad = m - rem
        spad = [(0, 0)] * (scal.ndim - 2) + [(0, pad), (0, 0)]
        part = msm_device_maybe_sharded(
            spec, dmsm._window_bits(m),
            jnp.pad(X[off:], ((0, pad), (0, 0))),
            jnp.pad(Y[off:], ((0, pad), (0, 0))),
            jnp.pad(inf[off:], (0, pad), constant_values=True),
            jnp.pad(scal[..., off:, :], spad),
        )
        acc = part if acc is None else dc.add(spec, acc, part)
    return acc


# Below this, a chunk is cheaper absorbed into the padded remainder than
# dispatched as its own program (each chunk costs a dispatch + one
# device point-add).
_RAGGED_MIN = 1024


def msm_device_maybe_sharded(spec, c, X, Y, inf, scal, base_map=None):
    """Drop-in for ops/msm.py::msm_device that shards across the engine's
    active mesh when one is configured and the shape divides evenly.
    On TPU meshes the per-shard kernel is the v2 fused mega-kernel (the
    same family as the single-chip fast path); CPU meshes and ragged
    shapes fall back to the v1 XLA-op Pippenger per shard.

    base_map (B, n): per-set base indirection (see ops/msm.py::msm_impl).
    Callers that shard over a mesh use the full-width path instead (the
    indirection would gather across shards), so base_map implies the
    single-device route here."""
    from .. import engine

    import os

    on_tpu = jax.devices()[0].platform != "cpu"
    mesh = engine.active_mesh()
    n = scal.shape[-2] if base_map is not None else X.shape[0]
    if base_map is not None:
        v2_ok = (
            on_tpu
            and isinstance(spec, (dc.CurveSpec, dc.TECurveSpec))
            and (n & (n - 1)) == 0
            and (n >= 1024 or (n >= 128 and scal.ndim == 3))
        )
        if v2_ok:
            from ..ops import msm2

            return msm2.msm2_device_jac(
                spec, msm2.window_bits(n), X, Y, inf, scal, base_map
            )
        return dmsm.msm_device(spec, c, X, Y, inf, scal, None, base_map)
    if mesh is not None:
        D = mesh.devices.size
        min_shard = int(os.environ.get("ABTPU_SHARD_MIN", "256"))
        if D > 1 and n % D == 0 and (n // D) >= min_shard:
            n_loc = n // D
            if on_tpu and _v2_shard_ok(spec, n_loc):
                from ..ops import msm2

                c_loc = msm2.window_bits(n_loc)
                key = ("arrays2", spec, mesh, c_loc, scal.ndim)
                fns = _JIT_CACHE.get(key)
                if fns is None:
                    pair = sharded_msm2_device_fn(spec, c_loc, mesh)
                    fns = (jax.jit(pair[0]), jax.jit(pair[1]))
                    _JIT_CACHE[key] = fns
                return fns[1 if scal.ndim == 3 else 0](X, Y, inf, scal)
            c_loc = dmsm._window_bits(n_loc)
            key = ("arrays", spec, mesh, c_loc, scal.ndim)
            fns = _JIT_CACHE.get(key)
            if fns is None:
                pair = sharded_msm_device_fn(spec, c_loc, mesh)
                fns = (jax.jit(pair[0]), jax.jit(pair[1]))
                _JIT_CACHE[key] = fns
            return fns[1 if scal.ndim == 3 else 0](X, Y, inf, scal)
    # single-chip TPU: the fused mega-kernel Pippenger (jacobian out;
    # TE extended out for twisted-Edwards curves — the v2 kernels are
    # model-generic since round 5, ops/kernels2.py::_g_madd).
    # Batched scalar sets qualify from n=256 (B*W rows keep the kernels
    # saturated — e.g. the IPA batch prover's (2P, 257) round MSMs);
    # single sets only from 1024 where the pipeline beats v1's overhead.
    v2_ok = (
        on_tpu
        and isinstance(spec, (dc.CurveSpec, dc.TECurveSpec))
        and (n & (n - 1)) == 0
        and (n >= 1024 or (n >= 256 and scal.ndim == 3))
    )
    if v2_ok:
        from ..ops import msm2

        return msm2.msm2_device_jac(
            spec, msm2.window_bits(n), X, Y, inf, scal
        )
    return dmsm.msm_device(spec, c, X, Y, inf, scal)
