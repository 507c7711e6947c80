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

from .curve import CurveSpec, TECurveSpec
from .kernels import (
    _interpret,
    _k_rcb_add,
    _k_rcb_madd,
    _k_rcb_double,
    _k_te_add,
    _k_te_double,
    _k_te_madd,
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


# --- curve-model dispatch ------------------------------------------------
#
# The kernels are generic over the point representation: SW curves run
# 3-coord complete RCB projective (X:Y:Z), TE curves run 4-coord unified
# HWCD extended (X:Y:T:Z) — same bodies as the host law, so bit-parity
# with the host Pippenger is structural. All per-coord plumbing below is
# arity-driven by _nc().


def _nc(cs) -> int:
    return 4 if isinstance(cs, TECurveSpec) else 3


def _g_add(cs, P, Q):
    if isinstance(cs, TECurveSpec):
        return _k_te_add(cs, P, Q)
    return _k_rcb_add(cs, P, Q)


def _g_madd(cs, P, qx, qy, qi):
    if isinstance(cs, TECurveSpec):
        return _k_te_madd(cs, P, qx, qy, qi)
    return _k_rcb_madd(cs, P, qx, qy, qi)


def _ident_kinds(cs):
    """Per-coord identity encoding: SW (0 : 1 : 0), TE (0 : 1 : 0 : 1)."""
    return ("z", "o", "z", "o")[: _nc(cs)]


def _rd_s(ref):
    """(NL, B) scratch ref -> list of NL (B,) vectors.

    Indexes the ref row-by-row rather than loading the whole block and
    slicing: rows sliced from a full scratch load, fed through the
    group-law body as a fori carry, abort Mosaic's layout inference
    (layout.h:320 `arr.size() >= layout_rank(implicit_dim)`, hard
    SIGABRT — isolated on v5e 2026-08-19). Per-row ref loads lower
    cleanly and cost the same VMEM traffic.
    """
    return [ref[i] for i in range(NL)]


def _wr_s(ref, limbs):
    ref[:] = jnp.stack(limbs)


def _rd_rows(refs, j):
    """Row j of the per-coord (rows, NL, block) input refs as per-limb
    vectors.

    Direct (block,) loads per limb, uniform across all kernels: the
    2-D-slice-then-index form (`x_ref[pl.ds(j,1)][0]` then `x[i]`)
    compiled on v5e for jac_scan/rowsum/horner but the same shape fed
    through a SCRATCH fori-carry hard-SIGABRTs Mosaic layout inference
    (layout.h:320, isolated 2026-08-19 on the madd path), and per-row
    loads compile ~40% faster besides — so every kernel uses them.
    """
    return tuple([r[j, i] for i in range(NL)] for r in refs)


def _init_identity(cs, accs):
    """Scratch accumulators <- the model's identity (_ident_kinds)."""
    for ref, kind in zip(accs, _ident_kinds(cs)):
        if kind == "z":
            ref[:] = jnp.zeros_like(ref)
        else:
            ref[:] = jnp.stack(
                [jnp.full_like(ref[0], int(v)) for v in cs.fq.r_limbs]
            )


@partial(jax.jit, static_argnums=(0, 2, 3))
def suffix_madd_scan(cs, cXY, block: int = BLOCK,
                     rows: int = 8):
    """Per-column inclusive suffix sums of affine points.

    cXY: (R, NL, L) gathered affine coords, LIMB-MAJOR and PACKED —
    limb i holds `x_i | (y_i << 16)` (limbs are 16-bit values in u32
    lanes, so both coordinates fit one u32 plane). Packing halves the
    caller's row-gather count — the XLA:TPU gather is dispatch-bound at
    ~6 ns/row for <= 64-byte rows (and falls off a ~6x cliff at 128-byte
    rows, measured at n=2^20), so one packed 64-byte row beats two
    half-empty ones — and halves the limb-major transpose + kernel input
    DMA bandwidth. The unpack is 2 vector ops/limb in-register, noise
    next to the madd math. The caller transposes in XLA: an in-kernel
    (block, NL).T relayout measured ~45 ns/madd of pure Mosaic shuffle
    overhead — 8x the madd math itself — while the XLA transpose is
    bandwidth-bound. Identity rows are encoded as y = 0 (no valid point
    on an odd-order SW curve has y = 0).

    Each grid invocation scans `rows` rows with the running point in
    REGISTERS: one scratch round-trip and one in/out DMA per `rows`
    mixed adds.

    Returns locals (R, NL, L) x 3 projective coords where
    locals[r, :, l] = sum_{r' >= r} P[r', l] (identity-initialized,
    scanned from the last row upward); locals[0] are the column totals.
    """
    NC = _nc(cs)
    R, nl, L = cXY.shape
    assert nl == NL
    assert L % block == 0 and block % 128 == 0
    rows = min(rows, R)  # R is a power of two; small n can have R < rows
    assert R % rows == 0
    RB = R // rows

    def kern(xy_ref, *refs):
        louts, accs = refs[:NC], refs[NC:]
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, accs)

        # fori_loop so the madd body is compiled ONCE, not `rows` times
        # (unrolled, Mosaic took ~350 s/shape; ~60 s with the loop).
        def body(t, P):
            j = rows - 1 - t
            # Per-limb 1-D ref loads (see _rd_rows: the sliced-2-D form
            # SIGABRTs Mosaic when combined with this kernel's scratch
            # fori-carry, and per-row loads compile ~40% faster).
            qx = [xy_ref[j, i] & jnp.uint32(0xFFFF) for i in range(NL)]
            qy = [xy_ref[j, i] >> 16 for i in range(NL)]
            qi = qy[0]
            for i in range(1, NL):
                qi = qi | qy[i]
            P3 = _g_madd(cs, P, qx, qy, qi == 0)
            for ref, coord in zip(louts, P3):
                ref[pl.ds(j, 1)] = jnp.stack(coord)[None]
            return tuple(list(c) for c in P3)

        P = tuple(_rd_s(a) for a in accs)
        P = jax.lax.fori_loop(0, rows, body, P)
        for a, c in zip(accs, P):
            _wr_s(a, c)

    spec = pl.BlockSpec(
        (rows, NL, block), lambda i, r: (RB - 1 - r, 0, i),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, RB),
        in_specs=[spec],
        out_specs=tuple([spec] * NC),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, NL, L), jnp.uint32) for _ in range(NC)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * NC,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(cXY)


def _ident_value(cs, block):
    """Projective identity (0 : 1 : 0) as in-register limb vectors."""
    zero = jnp.zeros((block,), jnp.uint32)
    one = [jnp.full((block,), int(v), jnp.uint32) for v in cs.fq.r_limbs]
    return ([zero] * NL, one, [zero] * NL)


@partial(jax.jit, static_argnums=(0,), static_argnames=("block", "rows"))
def suffix_jac_scan(cs, *coords, block: int = 512, rows: int = 8):
    """Exclusive suffix sums over rows of points, plus totals.

    coords: NC arrays (Rb, NL, L) (NC = 3 SW projective / 4 TE
    extended). Returns NC exclusive arrays then NC totals:
    excl[r, :, l] = sum_{r' > r} T[r', l]; tot = inclusive total.
    `rows` rows per grid invocation, accumulator in registers (fori so
    the add body compiles once).
    """
    NC = _nc(cs)
    assert len(coords) == NC
    Rb, _, L = coords[0].shape
    assert L % block == 0 and block % 128 == 0
    rows = min(rows, Rb)
    assert Rb % rows == 0
    RB = Rb // rows

    def kern(*refs):
        ins = refs[:NC]
        excls = refs[NC:2 * NC]
        tots = refs[2 * NC:3 * NC]
        accs = refs[3 * NC:]
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, accs)

        def body(t, P):
            j = rows - 1 - t
            # exclusive: write the carry BEFORE accumulating this row
            for ref, coord in zip(excls, P):
                ref[pl.ds(j, 1)] = jnp.stack(coord)[None]
            Q = _rd_rows(ins, j)
            P3 = _g_add(cs, P, Q)
            return tuple(list(c) for c in P3)

        P = tuple(_rd_s(a) for a in accs)
        P = jax.lax.fori_loop(0, rows, body, P)
        for a, c in zip(accs, P):
            _wr_s(a, c)
        for tref, a in zip(tots, accs):
            tref[:] = a[:]

    spec = pl.BlockSpec(
        (rows, NL, block), lambda i, r: (RB - 1 - r, 0, i),
        memory_space=pltpu.VMEM,
    )
    tot_spec = pl.BlockSpec(
        (NL, block), lambda i, r: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, RB),
        in_specs=[spec] * NC,
        out_specs=tuple([spec] * NC + [tot_spec] * NC),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Rb, NL, L), jnp.uint32) for _ in range(NC)
        )
        + tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(NC)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * NC,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(*coords)


@partial(jax.jit, static_argnums=(0,), static_argnames=("block", "rows"))
def rowsum_jac(cs, *coords, block: int = 512, rows: int = 8):
    """Sum NC x (K, NL, L) point rows -> NC x (NL, L) totals, one
    launch (NC = 3 SW projective / 4 TE extended)."""
    NC = _nc(cs)
    assert len(coords) == NC
    K, _, L = coords[0].shape
    assert L % block == 0 and block % 128 == 0
    rows = min(rows, K)
    assert K % rows == 0
    KB = K // rows

    def kern(*refs):
        ins = refs[:NC]
        outs = refs[NC:2 * NC]
        accs = refs[2 * NC:]
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _init_identity(cs, accs)

        def body(j, P):
            Q = _rd_rows(ins, j)
            P3 = _g_add(cs, P, Q)
            return tuple(list(c) for c in P3)

        P = tuple(_rd_s(a) for a in accs)
        P = jax.lax.fori_loop(0, rows, body, P)
        for a, c in zip(accs, P):
            _wr_s(a, c)
        for oref, a in zip(outs, accs):
            oref[:] = a[:]

    spec = pl.BlockSpec(
        (rows, NL, block), lambda i, r: (r, 0, i),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (NL, block), lambda i, r: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block, KB),
        in_specs=[spec] * NC,
        out_specs=tuple([out_spec] * NC),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(NC)
        ),
        scratch_shapes=[pltpu.VMEM((NL, block), jnp.uint32)] * NC,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(*coords)


@partial(jax.jit, static_argnums=(0, 4, 5))
def horner_windows(cs: CurveSpec, pX, pY, pZ, c: int, block: int = 128):
    """acc = 2^c * acc + part[w] over the window axis, one launch.

    pX/pY/pZ: (W, NL, L) window partials, HIGHEST-weight window at row
    W-1; lanes L carry independent scalar-set accumulators. Returns the
    (NL, L) combined points. All W windows run inside ONE grid
    invocation (nested fori: the double and add bodies each compile
    once), with the accumulator in registers throughout.
    """
    W, _, L = pX.shape
    assert L % block == 0 and block % 128 == 0

    def kern(x_ref, y_ref, z_ref, ox, oy, oz):
        def dbl(_k, P):
            X3, Y3, Z3 = _k_rcb_double(cs, *P)
            return (list(X3), list(Y3), list(Z3))

        def wstep(t, P):
            P = jax.lax.fori_loop(0, c, dbl, P)
            j = W - 1 - t
            Q = _rd_rows((x_ref, y_ref, z_ref), j)
            X3, Y3, Z3 = _k_rcb_add(cs, P, Q)
            return (list(X3), list(Y3), list(Z3))

        P = jax.lax.fori_loop(0, W, wstep, _ident_value(cs, block))
        ox[:] = jnp.stack(P[0])
        oy[:] = jnp.stack(P[1])
        oz[:] = jnp.stack(P[2])

    spec = pl.BlockSpec(
        (W, NL, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (NL, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(L // block,),
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, L), jnp.uint32) for _ in range(3)
        ),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(pX, pY, pZ)
