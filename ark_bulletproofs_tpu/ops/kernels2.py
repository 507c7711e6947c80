"""Pallas TPU mega-kernels for the v2 MSM (ops/msm2.py).

The v1 MSM (ops/msm.py) drives one Pallas group-op launch per scan step
from XLA — tens of sequential launches plus a ~25 s XLA compile per
group-law instantiation. These kernels move the sequential loops INSIDE
a single pallas_call using the grid's innermost dimension with a VMEM
accumulator (the canonical TPU accumulate pattern), so one launch covers
a whole phase and the group law is instantiated once per kernel:

  suffix_madd_scan — rows of mixed (Jacobian+affine) adds, streaming the
      sorted points row-by-row and writing every intermediate accumulator
      (the per-column inclusive suffix sums Pippenger needs).
  suffix_jac_scan  — same over Jacobian rows, writing the EXCLUSIVE
      running sum (carry prefixes for the column-total suffix).
  rowsum_jac       — totals-only row reduction (bucket-sum collapse).
  horner_windows   — acc = 2^c * acc + part[w] over all windows in one
      launch (the final window recombination).

All kernels take limb-major (rows, 16, lanes) uint32 arrays with
lanes % BLOCK == 0. Points are homogeneous projective (X:Y:Z) with
identity (0:1:0); group bodies are the COMPLETE Renes-Costello-Batina
formulas from ops/kernels.py (no doubling branch, ~2x fewer muls than
the branch-free Jacobian bodies).
Replaces the bucket/window reduction of `ark_ec::VariableBaseMSM::msm`
(reference src/inner_product_proof.rs:104, src/r1cs/verifier.rs:574).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import CurveSpec
from .kernels import (
    _interpret,
    _k_rcb_add,
    _k_rcb_madd,
    _k_rcb_double,
)
from .limbs import N_LIMBS

NL = N_LIMBS
BLOCK = 1024

# The group-law bodies keep O(100) live limb-vector temporaries, so the
# Mosaic scoped-VMEM stack scales with the lane block (~6.7 KB/lane for
# the madd body). The default 16 MiB scoped limit caps blocks at ~2k
# lanes; v5e has 128 MiB of VMEM, so raise the limit and use wide blocks
# (fixed per-invocation latency amortizes over ~8x more lanes).
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def _rd(ref):
    """(1, NL, B) ref -> list of NL (B,) vectors."""
    x = ref[0]
    return [x[i] for i in range(NL)]


def _rd_s(ref):
    """(NL, B) scratch ref -> list of NL (B,) vectors."""
    x = ref[:]
    return [x[i] for i in range(NL)]


def _wr(ref, limbs):
    ref[0] = jnp.stack(limbs)


def _wr_s(ref, limbs):
    ref[:] = jnp.stack(limbs)


def _init_identity(cs, ax, ay, az):
    """Scratch accumulators <- projective identity (0 : 1 : 0)."""
    ax[:] = jnp.zeros_like(ax)
    ay[:] = jnp.stack(
        [jnp.full_like(ay[0], int(v)) for v in cs.fq.r_limbs]
    )
    az[:] = jnp.zeros_like(az)


@partial(jax.jit, static_argnums=(0, 3, 4))
def suffix_madd_scan(cs: CurveSpec, cX, cY, block: int = BLOCK,
                     rows: int = 8):
    """Per-column inclusive suffix sums of affine points.

    cX, cY: (R, NL, L) gathered affine coords, LIMB-MAJOR — the caller
    row-gathers limbs-last (the XLA:TPU gather is ~6 ns/row at <= 64-byte
    rows but falls off a ~6x cliff at 128-byte rows, measured at n=2^20)
    and then transposes in XLA: an in-kernel (block, NL).T relayout
    measured ~45 ns/madd of pure Mosaic shuffle overhead — 8x the madd
    math itself — while the XLA transpose is bandwidth-bound. Identity
    rows are encoded as y = 0 (no valid point on an odd-order SW curve
    has y = 0).

    Each grid invocation scans `rows` rows with the running point in
    REGISTERS: one scratch round-trip and one in/out DMA per `rows`
    mixed adds.

    Returns locals (R, NL, L) x 3 projective coords where
    locals[r, :, l] = sum_{r' >= r} P[r', l] (identity-initialized,
    scanned from the last row upward); locals[0] are the column totals.
    """
    R, nl, L = cX.shape
    assert nl == NL
    assert L % block == 0 and block % 128 == 0
    rows = min(rows, R)  # R is a power of two; small n can have R < rows
    assert R % rows == 0
    RB = R // rows

    def kern(x_ref, y_ref, lx, ly, lz, ax, ay, az):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, ax, ay, az)

        P = (_rd_s(ax), _rd_s(ay), _rd_s(az))
        for j in range(rows - 1, -1, -1):
            qx = [x_ref[j, i] for i in range(NL)]
            qy = [y_ref[j, i] for i in range(NL)]
            qi = qy[0]
            for i in range(1, NL):
                qi = qi | qy[i]
            P = _k_rcb_madd(cs, P, qx, qy, qi == 0)
            lx[j] = jnp.stack(P[0])
            ly[j] = jnp.stack(P[1])
            lz[j] = jnp.stack(P[2])
        _wr_s(ax, P[0])
        _wr_s(ay, P[1])
        _wr_s(az, P[2])

    spec = pl.BlockSpec(
        (rows, NL, block), lambda i, r: (RB - 1 - r, 0, i),
        memory_space=pltpu.VMEM,
    )
    in_spec = spec
    return pl.pallas_call(
        kern,
        grid=(L // block, RB),
        in_specs=[in_spec, in_spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, NL, L), jnp.uint32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * 3,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(cX, cY)


@partial(jax.jit, static_argnums=(0, 4))
def suffix_jac_scan(cs: CurveSpec, tX, tY, tZ, block: int = 512):
    """Exclusive suffix sums over rows of Jacobian points, plus totals.

    tX/tY/tZ: (Rb, NL, L). Returns (exclX, exclY, exclZ, totX, totY,
    totZ): excl[r, :, l] = sum_{r' > r} T[r', l]; tot = inclusive total.
    """
    Rb, _, L = tX.shape
    assert L % block == 0 and block % 128 == 0

    def kern(x_ref, y_ref, z_ref, ex, ey, ez, tx, ty, tz, ax, ay, az):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, ax, ay, az)

        # exclusive: write the carry BEFORE accumulating this row
        ex[0] = ax[:]
        ey[0] = ay[:]
        ez[0] = az[:]
        P = (_rd_s(ax), _rd_s(ay), _rd_s(az))
        Q = (_rd(x_ref), _rd(y_ref), _rd(z_ref))
        X3, Y3, Z3 = _k_rcb_add(cs, P, Q)
        _wr_s(ax, X3)
        _wr_s(ay, Y3)
        _wr_s(az, Z3)
        tx[:] = ax[:]
        ty[:] = ay[:]
        tz[:] = az[:]

    spec = pl.BlockSpec(
        (1, NL, block), lambda i, r: (Rb - 1 - r, 0, i),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (NL, block), lambda i, r: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, Rb),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec, tot_spec, tot_spec, tot_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Rb, NL, L), jnp.uint32) for _ in range(3)
        )
        + tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * 3,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(tX, tY, tZ)


@partial(jax.jit, static_argnums=(0, 4))
def rowsum_jac(cs: CurveSpec, tX, tY, tZ, block: int = 512):
    """Sum (K, NL, L) Jacobian rows -> (NL, L) totals, one launch."""
    K, _, L = tX.shape
    assert L % block == 0 and block % 128 == 0

    def kern(x_ref, y_ref, z_ref, ox, oy, oz, ax, ay, az):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, ax, ay, az)

        P = (_rd_s(ax), _rd_s(ay), _rd_s(az))
        Q = (_rd(x_ref), _rd(y_ref), _rd(z_ref))
        X3, Y3, Z3 = _k_rcb_add(cs, P, Q)
        _wr_s(ax, X3)
        _wr_s(ay, Y3)
        _wr_s(az, Z3)
        ox[:] = ax[:]
        oy[:] = ay[:]
        oz[:] = az[:]

    spec = pl.BlockSpec(
        (1, NL, block), lambda i, r: (r, 0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (NL, block), lambda i, r: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, K),
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * 3,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(tX, tY, tZ)


@partial(jax.jit, static_argnums=(0, 4, 5))
def horner_windows(cs: CurveSpec, pX, pY, pZ, c: int, block: int = 128):
    """acc = 2^c * acc + part[w] over the window axis, one launch.

    pX/pY/pZ: (W, NL, L) window partials, HIGHEST-weight window at row
    W-1; lanes L carry independent scalar-set accumulators. Returns the
    (NL, L) combined points.
    """
    W, _, L = pX.shape
    assert L % block == 0 and block % 128 == 0

    def kern(x_ref, y_ref, z_ref, ox, oy, oz, ax, ay, az):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, ax, ay, az)

        P = [_rd_s(ax), _rd_s(ay), _rd_s(az)]
        for _i in range(c):
            P = list(_k_rcb_double(cs, *P))
        Q = (_rd(x_ref), _rd(y_ref), _rd(z_ref))
        X3, Y3, Z3 = _k_rcb_add(cs, tuple(P), Q)
        _wr_s(ax, X3)
        _wr_s(ay, Y3)
        _wr_s(az, Z3)
        ox[:] = ax[:]
        oy[:] = ay[:]
        oz[:] = az[:]

    spec = pl.BlockSpec(
        (1, NL, block), lambda i, r: (W - 1 - r, 0, i),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (NL, block), lambda i, r: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, W),
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * 3,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(pX, pY, pZ)
