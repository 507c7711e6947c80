"""Multi-host (DCN) execution: process federation + global device meshes.

The reference has no distributed backend (SURVEY.md §2c); scaling across
hosts is a TPU-native requirement. The model here is standard JAX
multi-process SPMD:

  * every host runs the same program and calls `initialize()` once
    (coordinator address + process id from env or TPU pod metadata);
  * `global_mesh()` builds the 1-D "data" mesh over ALL processes'
    devices, process-major — a host's devices are contiguous on the
    mesh axis, so a `P("data")`-sharded array keeps each host's shard
    local and XLA lowers reductions hierarchically: intra-host partial
    sums ride ICI, only the per-host partials cross DCN;
  * the existing sharded MSM kernels (parallel/msm.py) are mesh-shape
    agnostic — the same shard_map programs run unchanged on a global
    mesh. Per-MSM cross-host traffic is O(devices) Jacobian partials
    (~192 bytes each), independent of n, so DCN latency (not bandwidth)
    is the only scaling cost;
  * inputs are built with `shard_host_data`: each host feeds ONLY its
    local slice (owner-computes — `GeneratorsChain.fast_forward` lets a
    host generate exactly its range of the generator table without
    materializing the rest).

On CPU test rigs the same code federates over gloo
(`jax_cpu_collectives_implementation`), which is how
tests/test_multihost.py drives a real 2-process mesh on one machine —
the same code path a v5p multi-host slice would take, with DCN swapped
for TCP.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import DATA_AXIS

_initialized = [False]


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join (or form) a multi-process JAX job. Idempotent.

    Args default from ABTPU_COORDINATOR / ABTPU_NUM_PROCESSES /
    ABTPU_PROCESS_ID; with none present and no TPU pod metadata this is
    a no-op returning False (single-process mode). On CPU platforms the
    gloo collectives backend is selected so cross-process collectives
    work on test rigs.
    """
    if _initialized[0]:
        return True
    coordinator = coordinator or os.environ.get("ABTPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("ABTPU_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("ABTPU_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator is None and num_processes is None:
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax spelling
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized[0] = True
    return True


def global_mesh() -> Mesh:
    """1-D data mesh over every device of every process (process-major:
    `jax.devices()` orders devices by process index, keeping each
    host's mesh segment contiguous for hierarchical ICI/DCN lowering)."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def shard_host_data(mesh: Mesh, local_rows: np.ndarray, global_rows: int):
    """Build a P("data")-sharded global array from THIS host's slice.

    `local_rows` is the contiguous block of rows this process owns
    (global row `process_index * global_rows / process_count` onward);
    no host ever materializes the full array.
    """
    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    shape = (global_rows,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_rows, shape
    )


def _host_range(global_n: int) -> tuple[int, int]:
    """[start, stop) of the rows this process owns (contiguous blocks)."""
    pc, pi = jax.process_count(), jax.process_index()
    assert global_n % pc == 0, "global length must divide process count"
    per = global_n // pc
    return pi * per, (pi + 1) * per


def msm_multihost(curve, local_pts, local_ks, global_n: int,
                  mesh: Mesh | None = None, kind: str = "pippenger"):
    """Multi-host MSM: each host contributes its contiguous slice.

    local_pts / local_ks: this host's `global_n / process_count` points
    (affine int pairs or None) and scalars. Returns the affine result
    (replicated; identical on every host). kind="serial" selects the
    compile-light per-shard kernel for test rigs.
    """
    from ..ops import curve as dc
    from ..ops import msm as dmsm
    from ..ops.limbs import ints_to_limbs
    from .msm import _jitted

    if mesh is None:
        mesh = global_mesh()
    D = mesh.devices.size
    assert global_n % D == 0, "global_n must divide the mesh size"
    spec = dc.spec_for(curve)
    p = curve.fr.p
    X, Y, inf = dc.affine_to_device(curve, local_pts)
    scal = ints_to_limbs([k % p for k in local_ks])
    Xg = shard_host_data(mesh, np.asarray(X), global_n)
    Yg = shard_host_data(mesh, np.asarray(Y), global_n)
    infg = shard_host_data(mesh, np.asarray(inf), global_n)
    sg = shard_host_data(mesh, np.asarray(scal), global_n)
    if kind == "pippenger":
        c = dmsm._window_bits(global_n // D)
        fn = _jitted("pippenger", spec, mesh, c)
    else:
        fn = _jitted("serial", spec, mesh)
    out = fn(Xg, Yg, infg, sg)
    # The tree-reduced result is replicated; every host reads the same
    # point (Montgomery Jacobian limbs -> host affine ints).
    return dc.jacobian_to_host(curve, out)
