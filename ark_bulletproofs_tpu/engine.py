"""Compute-engine dispatch: host exact path vs TPU device path.

Every hot vector primitive in the protocol funnels through this module so
the device backend (ark_bulletproofs_tpu.ops, JAX/Pallas) can take over for
large sizes while small/test workloads stay on the exact host path. The
crossover is size-based: device MSM pays a fixed launch + limb-conversion
cost, so tiny MSMs are faster on the host.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class EngineConfig:
    # "auto": device for large sizes when JAX is usable; "host": never use
    # the device; "jax": force the device path (used by backend tests).
    backend: str = os.environ.get("ABTPU_BACKEND", "auto")
    # Minimum MSM size for the device path. 512 since round 3: the TPU
    # shuffle sweep showed k=512 (2049-term MSMs) routed to the pure-
    # Python host path under the old 4096 floor and ran SLOWER than
    # k=1024 (13.4 s vs 11.3 s prove; 960 ms vs 216 ms verify) — the
    # device MSM + ~28 ms tunnel sync beats host Python from a few
    # hundred terms up.
    msm_device_threshold: int = int(os.environ.get("ABTPU_MSM_THRESHOLD", "512"))


config = EngineConfig()

_jax_ok: bool | None = None


def _jax_available() -> bool:
    global _jax_ok
    if _jax_ok is None:
        try:
            import jax  # noqa: F401

            _jax_ok = True
        except Exception:  # pragma: no cover
            _jax_ok = False
    return _jax_ok


def use_device(n: int, curve) -> bool:
    """Device kernels cover both curve models (SW Jacobian and TE
    extended coordinates)."""
    if config.backend == "host":
        return False
    if config.backend == "jax":
        return _jax_available()
    return n >= config.msm_device_threshold and _jax_available()


def msm(curve, bases: list, scalars: list[int]):
    """Multi-scalar multiplication: sum_i scalars[i] * bases[i] (affine out)."""
    if use_device(len(bases), curve):
        from .ops import msm as device_msm

        return device_msm.msm(curve, bases, scalars)
    return curve.msm(bases, scalars)


# --- multi-chip mesh (SURVEY.md §2c: sharded MSM / batch-verify) --------

_mesh = None


def set_mesh(mesh) -> None:
    """Install a jax.sharding.Mesh; subsequent large MSMs (single-proof
    mega-MSM, batch_verify, device IPA round commitments) shard their
    base-point axis across it. Pass None to go back to single-chip."""
    global _mesh
    _mesh = mesh


def active_mesh():
    """The installed mesh, or an auto-built 1-D all-device mesh when
    ABTPU_MESH=auto and more than one device is visible. None = off."""
    global _mesh
    if config.backend == "host":
        return None
    if _mesh is None and os.environ.get("ABTPU_MESH", "") == "auto":
        if _jax_available():
            import jax

            if len(jax.devices()) > 1:
                from .parallel.mesh import make_mesh

                _mesh = make_mesh()
    return _mesh


def msm_many(curve, bases: list, scalar_sets: list[list[int]]):
    """B MSMs over shared bases; one batched device program when the
    device path is active, else exact host Pippenger per set."""
    if scalar_sets and use_device(len(bases), curve):
        from .ops import msm as device_msm

        return device_msm.msm_many(curve, bases, scalar_sets)
    return [curve.msm(bases, ks) for ks in scalar_sets]
