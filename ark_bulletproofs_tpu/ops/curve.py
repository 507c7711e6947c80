"""Device (JAX) short-Weierstrass group law in Jacobian coordinates.

TPU-native replacement for the reference's ark-ec projective arithmetic
(used throughout, e.g. reference src/inner_product_proof.rs:3). Points are
pytrees of limb arrays (X, Y, Z), each (..., 16) uint32 in Montgomery
form; Z == 0 encodes the identity (matching the host model's (1,1,0)
convention in ark_bulletproofs_tpu/curves/models.py).

Everything is branch-free and batched: the complete `add` computes the
generic sum, the doubling, and the exceptional cases, then lane-selects.
That costs ~1.6x a plain add but keeps a single static XLA program — the
price of data-dependent control flow on TPU would be far higher.

Formulas: add-2007-bl / dbl-2007-bl (same as the host model, EFD), valid
for any curve a; `a` enters only doubling via M = 3*XX + a*ZZ^2.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import field as df
from .field import FieldSpec
from .limbs import N_LIMBS, int_to_limbs


@dataclass(frozen=True)
class CurveSpec:
    """Static curve constants (hashable for jit specialization)."""

    name: str
    fq: FieldSpec
    a: int
    a_mont_limbs: tuple  # a * R mod p
    is_a_zero: bool

    @classmethod
    def create(cls, name: str, fq: FieldSpec, a: int) -> "CurveSpec":
        a_mont = a % fq.p * ((1 << 256) % fq.p) % fq.p
        return cls(
            name=name,
            fq=fq,
            a=a,
            a_mont_limbs=tuple(int(v) for v in int_to_limbs(a_mont)),
            is_a_zero=(a % fq.p == 0),
        )


_SPECS: dict[str, CurveSpec] = {}


def spec_for(curve) -> CurveSpec:
    """CurveSpec for an ark_bulletproofs_tpu.curves.SWCurve."""
    s = _SPECS.get(curve.name)
    if s is None:
        s = CurveSpec.create(curve.name, df.spec_for(curve.fq), curve.a)
        _SPECS[curve.name] = s
    return s


# --- point containers ---------------------------------------------------

Point = tuple  # (X, Y, Z) limb arrays


def point_zero(shape=()):
    z = df.zero(shape)
    return (z, z, z)


def is_zero(P: Point):
    return df.is_zero(P[2])


def select(mask, P: Point, Q: Point):
    return tuple(df.select(mask, p, q) for p, q in zip(P, Q))


def neg(spec: CurveSpec, P: Point):
    X, Y, Z = P
    return (X, df.neg(spec.fq, Y), Z)


def broadcast_point(P: Point, shape):
    return tuple(jnp.broadcast_to(c, shape + (N_LIMBS,)) for c in P)


# --- group law ----------------------------------------------------------


def double(spec: CurveSpec, P: Point) -> Point:
    """dbl-2007-bl; identity (Z=0) and 2-torsion (Y=0) both yield Z3=0."""
    f = spec.fq
    X1, Y1, Z1 = P
    XX = df.mont_sqr(f, X1)
    YY = df.mont_sqr(f, Y1)
    YYYY = df.mont_sqr(f, YY)
    ZZ = df.mont_sqr(f, Z1)
    xpyy = df.add(f, X1, YY)
    S = df.sub(f, df.mont_sqr(f, xpyy), df.add(f, XX, YYYY))
    S = df.add(f, S, S)
    M = df.add(f, df.add(f, XX, XX), XX)
    if not spec.is_a_zero:
        a_m = jnp.asarray(np.array(spec.a_mont_limbs, dtype=np.uint32))
        M = df.add(f, M, df.mont_mul(f, a_m, df.mont_sqr(f, ZZ)))
    X3 = df.sub(f, df.mont_sqr(f, M), df.add(f, S, S))
    Y3 = df.sub(
        f,
        df.mont_mul(f, M, df.sub(f, S, X3)),
        df.double_k(f, YYYY, 3),
    )
    ypz = df.add(f, Y1, Z1)
    Z3 = df.sub(f, df.mont_sqr(f, ypz), df.add(f, YY, ZZ))
    return (X3, Y3, Z3)


def add(spec: CurveSpec, P: Point, Q: Point) -> Point:
    """Complete Jacobian addition (handles identity, equal, inverse)."""
    f = spec.fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    p_inf = df.is_zero(Z1)
    q_inf = df.is_zero(Z2)

    Z1Z1 = df.mont_sqr(f, Z1)
    Z2Z2 = df.mont_sqr(f, Z2)
    U1 = df.mont_mul(f, X1, Z2Z2)
    U2 = df.mont_mul(f, X2, Z1Z1)
    S1 = df.mont_mul(f, df.mont_mul(f, Y1, Z2), Z2Z2)
    S2 = df.mont_mul(f, df.mont_mul(f, Y2, Z1), Z1Z1)

    H = df.sub(f, U2, U1)
    rr = df.sub(f, S2, S1)
    x_eq = df.is_zero(H)
    y_eq = df.is_zero(rr)
    rr = df.add(f, rr, rr)  # r = 2*(S2-S1)

    I = df.mont_sqr(f, df.add(f, H, H))  # (2H)^2
    J = df.mont_mul(f, H, I)
    V = df.mont_mul(f, U1, I)
    X3 = df.sub(f, df.mont_sqr(f, rr), df.add(f, J, df.add(f, V, V)))
    S1J = df.mont_mul(f, S1, J)
    Y3 = df.sub(
        f,
        df.mont_mul(f, rr, df.sub(f, V, X3)),
        df.add(f, S1J, S1J),
    )
    zpz = df.add(f, Z1, Z2)
    Z3 = df.mont_mul(
        f, df.sub(f, df.mont_sqr(f, zpz), df.add(f, Z1Z1, Z2Z2)), H
    )
    R = (X3, Y3, Z3)

    dbl = double(spec, P)
    R = select(x_eq & y_eq, dbl, R)  # P == Q -> double
    R = select(x_eq & ~y_eq & ~p_inf & ~q_inf, point_zero(x_eq.shape), R)
    R = select(p_inf, Q, R)
    R = select(q_inf, P, R)
    return R


def add_mixed(spec: CurveSpec, P: Point, Qx, Qy, q_inf) -> Point:
    """Complete mixed addition: Q given in affine coordinates (Z2 = 1).

    madd-2007-bl: saves 5 of the 16 Montgomery muls of the general add —
    this is the bucket-accumulation workhorse, where one operand is always
    an input point in affine form.
    """
    f = spec.fq
    X1, Y1, Z1 = P
    p_inf = df.is_zero(Z1)

    Z1Z1 = df.mont_sqr(f, Z1)
    U2 = df.mont_mul(f, Qx, Z1Z1)
    S2 = df.mont_mul(f, df.mont_mul(f, Qy, Z1), Z1Z1)

    H = df.sub(f, U2, X1)
    rr = df.sub(f, S2, Y1)
    x_eq = df.is_zero(H)
    y_eq = df.is_zero(rr)
    rr = df.add(f, rr, rr)

    I = df.mont_sqr(f, df.add(f, H, H))
    J = df.mont_mul(f, H, I)
    V = df.mont_mul(f, X1, I)
    X3 = df.sub(f, df.mont_sqr(f, rr), df.add(f, J, df.add(f, V, V)))
    S1J = df.mont_mul(f, Y1, J)
    Y3 = df.sub(
        f,
        df.mont_mul(f, rr, df.sub(f, V, X3)),
        df.add(f, S1J, S1J),
    )
    zph = df.add(f, Z1, H)
    Z3 = df.sub(f, df.mont_sqr(f, zph), df.add(f, Z1Z1, df.mont_sqr(f, H)))
    R = (X3, Y3, Z3)

    dbl = double(spec, P)
    R = select(x_eq & y_eq, dbl, R)
    R = select(x_eq & ~y_eq & ~p_inf & ~q_inf, point_zero(x_eq.shape), R)
    one = df.mont_one(f, q_inf.shape)
    Q_full = (Qx, Qy, jnp.where(q_inf[..., None], jnp.zeros_like(one), one))
    R = select(p_inf, Q_full, R)
    R = select(q_inf, P, R)
    return R


# --- conversions --------------------------------------------------------


def affine_to_device(curve, points) -> tuple:
    """Host affine int points -> device (X, Y mont limbs, inf mask).

    Cached per-identity on the curve's generator tables would live above;
    this does the raw conversion.
    """
    from .limbs import ints_to_limbs

    f = curve.fq
    R = f.R
    xs, ys, inf = [], [], []
    for P in points:
        if P is None:
            xs.append(0)
            ys.append(0)
            inf.append(True)
        else:
            xs.append(P[0] * R % f.p)
            ys.append(P[1] * R % f.p)
            inf.append(False)
    return (
        ints_to_limbs(xs),
        ints_to_limbs(ys),
        np.array(inf, dtype=bool),
    )


def jacobian_to_host(curve, P) -> object:
    """One device Jacobian point -> host affine int tuple (or None)."""
    from .limbs import limbs_to_int

    f = curve.fq
    X, Y, Z = (np.asarray(c).reshape(-1)[:N_LIMBS] for c in P)
    # undo Montgomery on host (exact, tiny)
    Rinv = f.R_inv
    x = limbs_to_int(X) * Rinv % f.p
    y = limbs_to_int(Y) * Rinv % f.p
    z = limbs_to_int(np.asarray(P[2]).reshape(-1)[:N_LIMBS]) * Rinv % f.p
    if z == 0:
        return None
    zi = pow(z, -1, f.p)
    zi2 = zi * zi % f.p
    return (x * zi2 % f.p, y * zi2 % f.p * zi % f.p)


@partial(jax.jit, static_argnums=0)
def batch_add(spec: CurveSpec, P, Q):
    return add(spec, P, Q)


@partial(jax.jit, static_argnums=0)
def batch_double(spec: CurveSpec, P):
    return double(spec, P)
