"""Multi-chip sharded MSM via shard_map over a 1-D device mesh.

Strategy (SPMD, ICI-friendly): points and scalars are sharded on their
leading axis; every device runs the full single-chip Pippenger
(ops/msm.py) on its local shard — bucket accumulation is embarrassingly
parallel across point shards because group addition commutes — then the
per-device Jacobian partials (one point each, ~384 bytes) are all-gathered
over ICI and tree-added on every device. Communication is O(devices),
independent of n, so scaling is linear up to sort/compile overheads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import curve as dc
from ..ops import msm as dmsm
from .mesh import DATA_AXIS


def _local_then_allreduce(spec, c, X, Y, inf, scal):
    part = dmsm.msm_impl(spec, c, X, Y, inf, scal)
    # (3, 16) point -> gather partials from every device: (D, 16) per coord
    gathered = tuple(
        jax.lax.all_gather(coord, DATA_AXIS, axis=0) for coord in part
    )
    D = gathered[0].shape[0]
    acc = tuple(g[0] for g in gathered)
    for i in range(1, D):
        acc = dc.add(spec, acc, tuple(g[i] for g in gathered))
    return acc


def sharded_msm_fn(spec: dc.CurveSpec, c: int, mesh: Mesh):
    """Returns a jittable fn (X, Y, inf, scal) -> replicated Jacobian point.

    Inputs are global arrays with leading axis divisible by the mesh size;
    shard_map splits them across DATA_AXIS.
    """
    local = partial(_local_then_allreduce, spec, c)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
        # the MSM scan carries start as replicated constants and become
        # device-varying on the first iteration; skip the vma check
        check_vma=False,
    )


def msm_sharded(curve, bases: list, scalars: list[int], mesh: Mesh):
    """Host-facing multi-chip MSM (affine int points in/out)."""
    import numpy as np

    from ..ops.limbs import ints_to_limbs

    n = len(bases)
    if n == 0:
        return curve.zero()
    spec = dc.spec_for(curve)
    D = mesh.devices.size
    m = dmsm._pad_pow2(max(n, D))
    m = ((m + D - 1) // D) * D
    fr_p = curve.fr.p
    ks = [s % fr_p for s in scalars] + [0] * (m - n)
    pts = list(bases) + [None] * (m - n)
    X, Y, inf = dc.affine_to_device(curve, pts)
    scal = ints_to_limbs(ks)
    c = dmsm._window_bits(m // D)
    fn = jax.jit(sharded_msm_fn(spec, c, mesh))
    out = fn(X, Y, np.asarray(inf), scal)
    return dc.jacobian_to_host(curve, out)
