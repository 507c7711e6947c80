"""XLA-path complete projective group law (Renes-Costello-Batina).

Homogeneous (X:Y:Z) short-Weierstrass points, identity (0:1:0). The
formulas are COMPLETE on odd-order curves — no doubling branch, no
identity selects — so the graphs are ~2x smaller/faster than the
branch-free Jacobian path in ops/curve.py. Used for the glue point math
of the v2 MSM (ops/msm2.py); the heavy row scans use the fused kernel
bodies (ops/kernels.py::_k_rcb_*).

Replaces the same reference primitive as ops/curve.py (ark-ec group
law behind VariableBaseMSM, reference src/inner_product_proof.rs:104).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import field as df
from .curve import CurveSpec, TECurveSpec
from .limbs import N_LIMBS

Point = tuple  # SW: (X, Y, Z) projective; TE: (X, Y, T, Z) extended.
# Every public function below dispatches on the spec model: SW runs the
# RCB complete projective law, TE the unified HWCD extended law from
# ops/curve.py — so v2-MSM glue code (ops/msm2.py) and its callers are
# model-agnostic.


def _te(spec) -> bool:
    return isinstance(spec, TECurveSpec)


def point_zero(spec, shape=()) -> Point:
    one = df.mont_one(spec.fq, shape)
    z = jnp.zeros(shape + (N_LIMBS,), jnp.uint32)
    if _te(spec):
        return (z, one, jnp.zeros_like(z), one)  # (0 : 1 : 0 : 1)
    return (z, one, jnp.zeros_like(z))


def is_zero(P: Point):
    return df.is_zero(P[2])


def select(mask, P: Point, Q: Point) -> Point:
    return tuple(df.select(mask, a, b) for a, b in zip(P, Q))


def _mul_const(fs, x, mont_limbs, small):
    if small is not None:
        return df.mul_small(fs, x, small)
    c = jnp.broadcast_to(
        jnp.asarray(np.array(mont_limbs, dtype=np.uint32)), x.shape
    )
    return df.mont_mul(fs, x, c)


def add(spec, P: Point, Q: Point) -> Point:
    """Complete P + Q (RCB Alg 1 general a / Alg 7 for a=0; TE: unified
    HWCD extended).

    Dispatches to the fused Pallas kernel for TPU shapes (one launch vs
    ~100 XLA kernels), like ops/curve.py::add does for Jacobian."""
    from . import curve as dc

    if _te(spec):
        return dc.add(spec, P, Q)  # dispatches to the TE tiled kernel
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in P), *(c.shape[:-1] for c in Q)
    )
    if dc._use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, _ = dc._flat_pad(list(P) + list(Q), shape)
        return dc._unflat(kk.rcb_add_tiled(spec, *flat), shape, lanes)
    return _add_xla(spec, P, Q)


def _add_xla(spec: CurveSpec, P: Point, Q: Point) -> Point:
    fs = spec.fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul, ad, sb = df.mont_mul, df.add, df.sub
    b3l, b3s = spec.b3_mont_limbs, spec.b3_small

    t0 = mul(fs, X1, X2)
    t1 = mul(fs, Y1, Y2)
    t2 = mul(fs, Z1, Z2)
    t3 = mul(fs, ad(fs, X1, Y1), ad(fs, X2, Y2))
    t3 = sb(fs, t3, ad(fs, t0, t1))
    t4 = mul(fs, ad(fs, X1, Z1), ad(fs, X2, Z2))
    t4 = sb(fs, t4, ad(fs, t0, t2))
    t5 = mul(fs, ad(fs, Y1, Z1), ad(fs, Y2, Z2))
    t5 = sb(fs, t5, ad(fs, t1, t2))
    if spec.is_a_zero:
        X3 = _mul_const(fs, t2, b3l, b3s)
        Z3 = ad(fs, t1, X3)
        t1 = sb(fs, t1, X3)
        Y3 = _mul_const(fs, t4, b3l, b3s)
        t03 = df.mul_small(fs, t0, 3)
        X3 = mul(fs, t5, Y3)
        t2 = mul(fs, t3, t1)
        X3 = sb(fs, t2, X3)
        Y3 = mul(fs, Y3, t03)
        t1 = mul(fs, t1, Z3)
        Y3 = ad(fs, t1, Y3)
        t03 = mul(fs, t03, t3)
        Z3 = mul(fs, Z3, t5)
        Z3 = ad(fs, Z3, t03)
        return X3, Y3, Z3
    al, asm = spec.a_mont_limbs, spec.a_small
    Z3 = _mul_const(fs, t4, al, asm)
    X3 = _mul_const(fs, t2, b3l, b3s)
    Z3 = ad(fs, X3, Z3)
    X3 = sb(fs, t1, Z3)
    Z3 = ad(fs, t1, Z3)
    Y3 = mul(fs, X3, Z3)
    t1 = df.mul_small(fs, t0, 3)
    t2 = _mul_const(fs, t2, al, asm)
    t4b = _mul_const(fs, t4, b3l, b3s)
    t1 = ad(fs, t1, t2)
    t2 = sb(fs, t0, t2)
    t2 = _mul_const(fs, t2, al, asm)
    t4 = ad(fs, t4b, t2)
    t0 = mul(fs, t1, t4)
    Y3 = ad(fs, Y3, t0)
    t0 = mul(fs, t5, t4)
    X3 = mul(fs, t3, X3)
    X3 = sb(fs, X3, t0)
    t0 = mul(fs, t3, t1)
    Z3 = mul(fs, t5, Z3)
    Z3 = ad(fs, Z3, t0)
    return X3, Y3, Z3


def add_mixed(spec: CurveSpec, P: Point, Qx, Qy, q_inf) -> Point:
    """Complete P + affine Q (RCB Alg 2 / Alg 8); q_inf lanes pass P."""
    fs = spec.fq
    X1, Y1, Z1 = P
    mul, ad, sb = df.mont_mul, df.add, df.sub
    b3l, b3s = spec.b3_mont_limbs, spec.b3_small

    t0 = mul(fs, X1, Qx)
    t1 = mul(fs, Y1, Qy)
    t3 = mul(fs, ad(fs, Qx, Qy), ad(fs, X1, Y1))
    t3 = sb(fs, t3, ad(fs, t0, t1))
    t4 = ad(fs, mul(fs, Qx, Z1), X1)
    t5 = ad(fs, mul(fs, Qy, Z1), Y1)
    if spec.is_a_zero:
        t03 = df.mul_small(fs, t0, 3)
        t2 = _mul_const(fs, Z1, b3l, b3s)
        Z3 = ad(fs, t1, t2)
        t1 = sb(fs, t1, t2)
        Y3 = _mul_const(fs, t4, b3l, b3s)
        X3 = mul(fs, t5, Y3)
        t2 = mul(fs, t3, t1)
        X3 = sb(fs, t2, X3)
        Y3 = mul(fs, Y3, t03)
        t1 = mul(fs, t1, Z3)
        Y3 = ad(fs, t1, Y3)
        t03 = mul(fs, t03, t3)
        Z3 = mul(fs, Z3, t5)
        Z3 = ad(fs, Z3, t03)
    else:
        al, asm = spec.a_mont_limbs, spec.a_small
        Z3 = _mul_const(fs, t4, al, asm)
        X3 = _mul_const(fs, Z1, b3l, b3s)
        Z3 = ad(fs, X3, Z3)
        X3 = sb(fs, t1, Z3)
        Z3 = ad(fs, t1, Z3)
        Y3 = mul(fs, X3, Z3)
        t1 = df.mul_small(fs, t0, 3)
        t2 = _mul_const(fs, Z1, al, asm)
        t4b = _mul_const(fs, t4, b3l, b3s)
        t1 = ad(fs, t1, t2)
        t2 = sb(fs, t0, t2)
        t2 = _mul_const(fs, t2, al, asm)
        t4 = ad(fs, t4b, t2)
        t0 = mul(fs, t1, t4)
        Y3 = ad(fs, Y3, t0)
        t0 = mul(fs, t5, t4)
        X3 = mul(fs, t3, X3)
        X3 = sb(fs, X3, t0)
        t0 = mul(fs, t3, t1)
        Z3 = mul(fs, t5, Z3)
        Z3 = ad(fs, Z3, t0)
    qi = jnp.broadcast_to(q_inf, X1.shape[:-1])
    return (
        df.select(qi, X1, X3),
        df.select(qi, Y1, Y3),
        df.select(qi, Z1, Z3),
    )


def double(spec, P: Point) -> Point:
    """Complete projective doubling (RCB Alg 3 / Alg 9; TE: unified)."""
    from . import curve as dc

    if _te(spec):
        return dc.double(spec, P)  # dispatches to the TE tiled kernel
    shape = jnp.broadcast_shapes(*(c.shape[:-1] for c in P))
    if dc._use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, _ = dc._flat_pad(list(P), shape)
        return dc._unflat(kk.rcb_double_tiled(spec, *flat), shape, lanes)
    return _double_xla(spec, P)


def _double_xla(spec: CurveSpec, P: Point) -> Point:
    fs = spec.fq
    X1, Y1, Z1 = P
    mul, ad, sb = df.mont_mul, df.add, df.sub
    b3l, b3s = spec.b3_mont_limbs, spec.b3_small
    if spec.is_a_zero:
        t0 = mul(fs, Y1, Y1)
        Z3 = df.mul_small(fs, t0, 8)
        t1 = mul(fs, Y1, Z1)
        t2 = mul(fs, Z1, Z1)
        t2 = _mul_const(fs, t2, b3l, b3s)
        X3 = mul(fs, t2, Z3)
        Y3 = ad(fs, t0, t2)
        Z3 = mul(fs, t1, Z3)
        t2 = df.mul_small(fs, t2, 3)
        t0 = sb(fs, t0, t2)
        Y3 = mul(fs, t0, Y3)
        Y3 = ad(fs, X3, Y3)
        t1 = mul(fs, X1, Y1)
        X3 = mul(fs, t0, t1)
        X3 = ad(fs, X3, X3)
        return X3, Y3, Z3
    al, asm = spec.a_mont_limbs, spec.a_small
    t0 = mul(fs, X1, X1)
    t1 = mul(fs, Y1, Y1)
    t2 = mul(fs, Z1, Z1)
    t3 = mul(fs, X1, Y1)
    t3 = ad(fs, t3, t3)
    Z3 = mul(fs, X1, Z1)
    Z3 = ad(fs, Z3, Z3)
    X3 = _mul_const(fs, Z3, al, asm)
    Y3 = _mul_const(fs, t2, b3l, b3s)
    Y3 = ad(fs, X3, Y3)
    X3 = sb(fs, t1, Y3)
    Y3 = ad(fs, t1, Y3)
    Y3 = mul(fs, X3, Y3)
    X3 = mul(fs, t3, X3)
    Z3b = _mul_const(fs, Z3, b3l, b3s)
    t2 = _mul_const(fs, t2, al, asm)
    t3n = sb(fs, t0, t2)
    t3n = _mul_const(fs, t3n, al, asm)
    t3n = ad(fs, t3n, Z3b)
    Z3 = df.mul_small(fs, t0, 3)
    t0 = ad(fs, Z3, t2)
    t0 = mul(fs, t0, t3n)
    Y3 = ad(fs, Y3, t0)
    t2 = mul(fs, Y1, Z1)
    t2 = ad(fs, t2, t2)
    t0 = mul(fs, t2, t3n)
    X3 = sb(fs, X3, t0)
    Z3 = mul(fs, t2, t1)
    Z3 = df.mul_small(fs, Z3, 4)
    return X3, Y3, Z3


def affine_from_host(curve, points):
    """Host affine points -> (X, Y, inf) device arrays (same encoding as
    ops/curve.py::affine_to_device; projective Z is implied = 1)."""
    from . import curve as dc

    return dc.affine_to_device(curve, points)


def point_to_host(curve, P) -> object:
    """One projective device point -> host affine tuple (None=identity)."""
    from .limbs import limbs_to_int

    f = curve.fq
    Rinv = f.R_inv

    def coord(i):
        return (
            limbs_to_int(np.asarray(P[i]).reshape(-1)[:N_LIMBS]) * Rinv % f.p
        )

    x, y, z = coord(0), coord(1), coord(2)
    if z == 0:
        return None
    zi = pow(z, -1, f.p)
    return (x * zi % f.p, y * zi % f.p)


def to_jacobian(spec, P: Point) -> Point:
    """(X:Y:Z) projective -> equivalent Jacobian (XZ, YZ^2, Z).

    Three field muls; the identity (Z=0) maps to the Jacobian identity
    encoding (0, 0, 0). Lets the v2 MSM (projective-native) feed callers
    that expect Jacobian points (ops/curve.py conventions). TE points
    are already in the ops/curve.py extended representation: identity
    pass-through."""
    if _te(spec):
        return P
    fs = spec.fq
    X, Y, Z = P
    Z2 = df.mont_mul(fs, Z, Z)
    return (df.mont_mul(fs, X, Z), df.mont_mul(fs, Y, Z2), Z)
