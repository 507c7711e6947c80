"""Device (JAX) short-Weierstrass group law in Jacobian coordinates.

TPU-native replacement for the reference's ark-ec projective arithmetic
(used throughout, e.g. reference src/inner_product_proof.rs:3). Points are
pytrees of limb arrays (X, Y, Z), each (..., 16) uint32 in Montgomery
form; Z == 0 encodes the identity (matching the host model's (1,1,0)
convention in ark_bulletproofs_tpu/curves/models.py).

Everything is branch-free and batched: the complete `add` computes the
generic sum, the doubling, and the exceptional cases, then lane-selects.
Independent field multiplies inside a formula are STACKED into single
`mont_mul` calls — MSM scans instantiate this group law dozens of times,
so per-instance graph size directly bounds XLA compile time, and stacking
also widens the vector work handed to the VPU.

Formulas: add-2007-bl / madd-2007-bl / dbl-2007-bl (EFD; same as the host
model), valid for any curve a; `a` enters only doubling via M += a*ZZ^2.
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
    b_mont_limbs: tuple  # b * R mod p
    is_a_zero: bool
    # RCB complete projective formulas: b3 = 3b; when the PLAIN constant
    # is small (< 2^16) kernels use double-and-add instead of a full mul.
    b3_mont_limbs: tuple = ()
    b3_small: int | None = None
    a_small: int | None = None

    @classmethod
    def create(cls, name: str, fq: FieldSpec, a: int, b: int) -> "CurveSpec":
        R = (1 << 256) % fq.p
        a_, b3 = a % fq.p, 3 * b % fq.p
        return cls(
            name=name,
            fq=fq,
            a=a,
            a_mont_limbs=tuple(int(v) for v in int_to_limbs(a_ * R % fq.p)),
            b_mont_limbs=tuple(int(v) for v in int_to_limbs(b % fq.p * R % fq.p)),
            is_a_zero=(a_ == 0),
            b3_mont_limbs=tuple(int(v) for v in int_to_limbs(b3 * R % fq.p)),
            b3_small=(3 * b if 0 < b < (1 << 14) else None),
            a_small=(a if 0 < a < (1 << 14) else None),
        )

    @property
    def a_mont_arr(self) -> np.ndarray:
        return np.array(self.a_mont_limbs, dtype=np.uint32)

    @property
    def b_mont_arr(self) -> np.ndarray:
        return np.array(self.b_mont_limbs, dtype=np.uint32)


@dataclass(frozen=True)
class TECurveSpec:
    """Twisted-Edwards curve constants (a*x^2 + y^2 = 1 + d*x^2*y^2)."""

    name: str
    fq: FieldSpec
    a_mont_limbs: tuple
    d_mont_limbs: tuple

    @classmethod
    def create(cls, name: str, fq: FieldSpec, a: int, d: int) -> "TECurveSpec":
        R = (1 << 256) % fq.p
        return cls(
            name=name,
            fq=fq,
            a_mont_limbs=tuple(int(v) for v in int_to_limbs(a % fq.p * R % fq.p)),
            d_mont_limbs=tuple(int(v) for v in int_to_limbs(d % fq.p * R % fq.p)),
        )

    @property
    def a_mont_arr(self) -> np.ndarray:
        return np.array(self.a_mont_limbs, dtype=np.uint32)

    @property
    def d_mont_arr(self) -> np.ndarray:
        return np.array(self.d_mont_limbs, dtype=np.uint32)


_SPECS: dict[str, object] = {}


def spec_for(curve):
    """CurveSpec / TECurveSpec for an ark_bulletproofs_tpu curve model."""
    s = _SPECS.get(curve.name)
    if s is None:
        if hasattr(curve, "b"):
            s = CurveSpec.create(
                curve.name, df.spec_for(curve.fq), curve.a, curve.b
            )
        else:
            s = TECurveSpec.create(
                curve.name, df.spec_for(curve.fq), curve.a, curve.d
            )
        _SPECS[curve.name] = s
    return s


# --- point containers ---------------------------------------------------
#
# SW points: (X, Y, Z) Jacobian, Z == 0 encodes identity.
# TE points: (X, Y, T, Z) extended, identity is the ordinary point
#            (0, 1, 0, 1) — no exceptional representation needed.

Point = tuple


def is_te(spec) -> bool:
    return isinstance(spec, TECurveSpec)


def point_zero(spec, shape=()):
    z = df.zero(shape)
    if is_te(spec):
        one = df.mont_one(spec.fq, shape)
        return (z, one, z, one)
    return (z, z, z)


def is_zero(spec, P: Point):
    if is_te(spec):
        return df.is_zero(P[0]) & df.eq(P[1], P[3])
    return df.is_zero(P[2])


def select(mask, P: Point, Q: Point):
    return tuple(df.select(mask, p, q) for p, q in zip(P, Q))


def neg(spec, P: Point):
    if is_te(spec):
        X, Y, T, Z = P
        f = spec.fq
        return (df.neg(f, X), Y, df.neg(f, T), Z)
    X, Y, Z = P
    return (X, df.neg(spec.fq, Y), Z)


def broadcast_point(P: Point, shape):
    return tuple(jnp.broadcast_to(c, shape + (N_LIMBS,)) for c in P)


def _mm(f: FieldSpec, xs, ys):
    """Batched Montgomery muls: one mont_mul instantiation for k products."""
    shape = jnp.broadcast_shapes(*(x.shape for x in xs + ys))
    a = jnp.stack([jnp.broadcast_to(x, shape) for x in xs], 0)
    b = jnp.stack([jnp.broadcast_to(y, shape) for y in ys], 0)
    r = df.mont_mul(f, a, b)
    return [r[i] for i in range(len(xs))]


def _mm_fast(f: FieldSpec, xs, ys):
    """`_mm` through the Pallas CIOS kernel (df.mont_mul_fast; CPU falls
    back to the XLA path inside). The TE model has no fused point
    kernels — its group law is built from these batched muls, and the
    XLA elementwise lowering measured ~11x slower end to end (TE v1 MSM
    (2, 2048): 1066 ms vs 95 ms for the kernel-backed SW path)."""
    shape = jnp.broadcast_shapes(*(x.shape for x in xs + ys))
    a = jnp.stack([jnp.broadcast_to(x, shape) for x in xs], 0)
    b = jnp.stack([jnp.broadcast_to(y, shape) for y in ys], 0)
    r = df.mont_mul_fast(f, a, b)
    return [r[i] for i in range(len(xs))]


# --- twisted-Edwards group law (extended coords, HWCD unified) ----------


def _te_add_core(spec: TECurveSpec, P: Point, X2, Y2, T2, Z2_or_none):
    """Unified extended addition; complete for a < 0 non-square d curves
    (curve25519's parameters). Handles identity and doubling uniformly.
    Mirrors the host model TECurve.proj_add
    (ark_bulletproofs_tpu/curves/models.py)."""
    f = spec.fq
    X1, Y1, T1, Z1 = P
    A, B, C0, E0 = _mm_fast(
        f, [X1, Y1, T1, df.add(f, X1, Y1)],
        [X2, Y2, T2, df.add(f, X2, Y2)],
    )
    (C,) = _mm_fast(f, [jnp.asarray(spec.d_mont_arr)], [C0])
    if Z2_or_none is None:
        D = Z1
    else:
        (D,) = _mm_fast(f, [Z1], [Z2_or_none])
    E = df.sub(f, E0, df.add(f, A, B))
    F = df.sub(f, D, C)
    G = df.add(f, D, C)
    (aA,) = _mm_fast(f, [jnp.asarray(spec.a_mont_arr)], [A])
    H = df.sub(f, B, aA)
    X3, Y3, T3, Z3 = _mm_fast(f, [E, G, E, F], [F, H, H, G])
    return (X3, Y3, T3, Z3)


def _te_double(spec: TECurveSpec, P: Point) -> Point:
    return _te_add_core(spec, P, P[0], P[1], P[2], P[3])


def _te_add(spec: TECurveSpec, P: Point, Q: Point) -> Point:
    return _te_add_core(spec, P, Q[0], Q[1], Q[2], Q[3])


def _te_add_mixed(spec: TECurveSpec, P: Point, Qx, Qy, q_inf) -> Point:
    """Q affine (Z2 = 1, T2 = x*y computed on the fly); q_inf rows add
    the identity (0, 1) instead."""
    f = spec.fq
    zero = jnp.zeros_like(Qx)
    one = df.mont_one(f, Qx.shape[:-1])
    Qx = df.select(q_inf, zero, Qx)
    Qy = df.select(q_inf, one, Qy)
    (T2,) = _mm_fast(f, [Qx], [Qy])
    return _te_add_core(spec, P, Qx, Qy, T2, None)


# --- short-Weierstrass group law (Jacobian) ------------------------------


def _sw_double(spec: CurveSpec, P: Point) -> Point:
    """dbl-2007-bl; identity (Z=0) and 2-torsion (Y=0) both yield Z3=0."""
    f = spec.fq
    X1, Y1, Z1 = P
    XX, YY, ZZ = _mm(f, [X1, Y1, Z1], [X1, Y1, Z1])
    xpyy = df.add(f, X1, YY)
    ypz = df.add(f, Y1, Z1)
    sq = [YY, xpyy, ypz]
    if not spec.is_a_zero:
        sq.append(ZZ)
    out = _mm(f, sq, sq)
    YYYY, xpyy2, ypz2 = out[:3]
    S = df.sub(f, xpyy2, df.add(f, XX, YYYY))
    S = df.add(f, S, S)
    M = df.add(f, df.add(f, XX, XX), XX)
    if not spec.is_a_zero:
        (aZZ2,) = _mm(f, [jnp.asarray(spec.a_mont_arr)], [out[3]])
        M = df.add(f, M, aZZ2)
    (M2,) = _mm(f, [M], [M])
    X3 = df.sub(f, M2, df.add(f, S, S))
    (MSX,) = _mm(f, [M], [df.sub(f, S, X3)])
    Y3 = df.sub(f, MSX, df.double_k(f, YYYY, 3))
    Z3 = df.sub(f, ypz2, df.add(f, YY, ZZ))
    return (X3, Y3, Z3)


def _sw_add(spec: CurveSpec, P: Point, Q: Point) -> Point:
    """Complete Jacobian addition (handles identity, equal, inverse)."""
    f = spec.fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    p_inf = df.is_zero(Z1)
    q_inf = df.is_zero(Z2)

    Z1Z1, Z2Z2 = _mm(f, [Z1, Z2], [Z1, Z2])
    U1, U2, A, B = _mm(f, [X1, X2, Y1, Y2], [Z2Z2, Z1Z1, Z2, Z1])
    S1, S2 = _mm(f, [A, B], [Z2Z2, Z1Z1])

    H = df.sub(f, U2, U1)
    rr0 = df.sub(f, S2, S1)
    x_eq = df.is_zero(H)
    y_eq = df.is_zero(rr0)
    rr = df.add(f, rr0, rr0)
    twoH = df.add(f, H, H)
    zpz = df.add(f, Z1, Z2)

    I, rr2, zpz2 = _mm(f, [twoH, rr, zpz], [twoH, rr, zpz])
    J, V = _mm(f, [H, U1], [I, I])
    X3 = df.sub(f, rr2, df.add(f, J, df.add(f, V, V)))
    w = df.sub(f, zpz2, df.add(f, Z1Z1, Z2Z2))
    t1, S1J, Z3 = _mm(f, [rr, S1, w], [df.sub(f, V, X3), J, H])
    Y3 = df.sub(f, t1, df.add(f, S1J, S1J))
    R = (X3, Y3, Z3)

    dbl = _sw_double(spec, P)
    R = select(x_eq & y_eq, dbl, R)  # P == Q -> double
    R = select(x_eq & ~y_eq & ~p_inf & ~q_inf, point_zero(spec, x_eq.shape), R)
    R = select(p_inf, Q, R)
    R = select(q_inf, P, R)
    return R


def _sw_add_mixed(spec: CurveSpec, P: Point, Qx, Qy, q_inf) -> Point:
    """Complete mixed addition: Q given in affine coordinates (Z2 = 1).

    madd-2007-bl: drops 5 of the general add's muls — this is the bucket
    accumulation workhorse, where one operand is an affine input point.
    """
    f = spec.fq
    X1, Y1, Z1 = P
    p_inf = df.is_zero(Z1)

    (Z1Z1,) = _mm(f, [Z1], [Z1])
    U2, B = _mm(f, [Qx, Qy], [Z1Z1, Z1])
    (S2,) = _mm(f, [B], [Z1Z1])

    H = df.sub(f, U2, X1)
    rr0 = df.sub(f, S2, Y1)
    x_eq = df.is_zero(H)
    y_eq = df.is_zero(rr0)
    rr = df.add(f, rr0, rr0)
    twoH = df.add(f, H, H)
    zph = df.add(f, Z1, H)

    I, rr2, zph2, HH = _mm(f, [twoH, rr, zph, H], [twoH, rr, zph, H])
    J, V = _mm(f, [H, X1], [I, I])
    X3 = df.sub(f, rr2, df.add(f, J, df.add(f, V, V)))
    t1, S1J = _mm(f, [rr, Y1], [df.sub(f, V, X3), J])
    Y3 = df.sub(f, t1, df.add(f, S1J, S1J))
    Z3 = df.sub(f, zph2, df.add(f, Z1Z1, HH))
    R = (X3, Y3, Z3)

    dbl = _sw_double(spec, P)
    R = select(x_eq & y_eq, dbl, R)
    R = select(x_eq & ~y_eq & ~p_inf & ~q_inf, point_zero(spec, x_eq.shape), R)
    one = df.mont_one(f, q_inf.shape)
    Q_full = (Qx, Qy, jnp.where(q_inf[..., None], jnp.zeros_like(one), one))
    R = select(p_inf, Q_full, R)
    R = select(q_inf, P, R)
    return R


# --- dispatchers ---------------------------------------------------------
#
# On TPU (and for SW curves), ops route to the fused Pallas kernels
# (ops/kernels.py): one kernel launch instead of ~100 XLA kernels per
# group op — the XLA path is dispatch/bandwidth-bound two orders of
# magnitude off VPU peak. Even 1-wide ops win: one padded BLOCK kernel
# launch (~30 us) beats the ~100-kernel XLA chain (~150+ us).

_KERNEL_MIN_LANES = 1


def _use_kernels(spec, shape) -> bool:
    import os

    if os.environ.get("ABTPU_NO_PALLAS"):
        return False
    if jax.devices()[0].platform == "cpu" and not os.environ.get(
        "ABTPU_FORCE_PALLAS"
    ):
        return False  # interpret-mode kernels are slower than the XLA path
    lanes = 1
    for d in shape:
        lanes *= d
    return lanes >= _KERNEL_MIN_LANES


def _flat_pad(arrs, shape):
    """Flatten leading dims of (..., 16) arrays and pad to BLOCK multiple."""
    from .kernels import BLOCK

    lanes = 1
    for d in shape:
        lanes *= d
    m = ((lanes + BLOCK - 1) // BLOCK) * BLOCK
    out = []
    for a in arrs:
        flat = jnp.broadcast_to(a, shape + (N_LIMBS,)).reshape(lanes, N_LIMBS)
        if m != lanes:
            flat = jnp.pad(flat, ((0, m - lanes), (0, 0)))
        out.append(flat)
    return out, lanes, m


def _unflat(arrs, shape, lanes):
    return tuple(a[:lanes].reshape(shape + (N_LIMBS,)) for a in arrs)


def double(spec, P: Point) -> Point:
    shape = jnp.broadcast_shapes(*(c.shape[:-1] for c in P))
    if _use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, _ = _flat_pad(list(P), shape)
        if is_te(spec):
            return _unflat(kk.te_double_tiled(spec, *flat), shape, lanes)
        return _unflat(kk.sw_double_tiled(spec, *flat), shape, lanes)
    if is_te(spec):
        return _te_double(spec, P)
    return _sw_double(spec, P)


def add(spec, P: Point, Q: Point) -> Point:
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in P), *(c.shape[:-1] for c in Q)
    )
    if _use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, _ = _flat_pad(list(P) + list(Q), shape)
        if is_te(spec):
            return _unflat(kk.te_add_tiled(spec, *flat), shape, lanes)
        return _unflat(kk.sw_add_tiled(spec, *flat), shape, lanes)
    if is_te(spec):
        return _te_add(spec, P, Q)
    return _sw_add(spec, P, Q)


def double_k_add(spec, P: Point, Q: Point, k: int) -> Point:
    """(2^k * P) + Q — the Horner step, fused into one kernel on TPU."""
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in P), *(c.shape[:-1] for c in Q)
    )
    if _use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, _ = _flat_pad(list(P) + list(Q), shape)
        if is_te(spec):
            return _unflat(
                kk.te_double_k_add_tiled(spec, *flat, k), shape, lanes
            )
        return _unflat(
            kk.sw_double_k_add_tiled(spec, *flat, k), shape, lanes
        )
    P = jax.lax.fori_loop(0, k, lambda i, a: double(spec, a), P)
    return add(spec, P, Q)


def add_mixed(spec, P: Point, Qx, Qy, q_inf) -> Point:
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in P), Qx.shape[:-1], Qy.shape[:-1], q_inf.shape
    )
    if _use_kernels(spec, shape):
        from . import kernels as kk

        flat, lanes, m = _flat_pad(list(P) + [Qx, Qy], shape)
        qi = jnp.broadcast_to(q_inf, shape).reshape(lanes)
        if m != lanes:
            qi = jnp.pad(qi, (0, m - lanes), constant_values=True)
        if is_te(spec):
            return _unflat(
                kk.te_madd_tiled(spec, *flat, qi), shape, lanes
            )
        return _unflat(
            kk.sw_madd_tiled(spec, *flat, qi), shape, lanes
        )
    if is_te(spec):
        return _te_add_mixed(spec, P, Qx, Qy, q_inf)
    return _sw_add_mixed(spec, P, Qx, Qy, q_inf)


# --- conversions --------------------------------------------------------


def affine_to_device(curve, points) -> tuple:
    """Host affine int points -> device (X, Y mont limbs, inf mask).

    The identity is marked in the `inf` mask for both models (for TE
    curves the kernels substitute the ordinary point (0, 1))."""
    from .limbs import ints_to_limbs

    f = curve.fq
    R = f.R
    te = not hasattr(curve, "b")
    ident = curve.zero() if te else None
    xs, ys, inf = [], [], []
    for P in points:
        if P is None or P == ident:
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


def point_to_host(curve, P) -> object:
    """One device point -> host affine int tuple (None = SW identity).

    ONE stacked device->host fetch: per-coordinate `np.asarray` calls
    are separate blocking tunnel RPCs (measured 3.1 s of a 4.2 s TE
    verify — 6 coord fetches — and ~180 ms of every SW verify)."""
    from .limbs import limbs_to_int

    f = curve.fq
    Rinv = f.R_inv
    arr = np.asarray(
        jnp.stack([jnp.asarray(c).reshape(-1)[:N_LIMBS] for c in P])
    )

    def coord(i):
        return limbs_to_int(arr[i]) * Rinv % f.p

    if len(P) == 4:  # TE extended
        x, y, z = coord(0), coord(1), coord(3)
        zi = pow(z, -1, f.p)
        return (x * zi % f.p, y * zi % f.p)
    x, y, z = coord(0), coord(1), coord(2)
    if z == 0:
        return None
    zi = pow(z, -1, f.p)
    zi2 = zi * zi % f.p
    return (x * zi2 % f.p, y * zi2 % f.p * zi % f.p)


# Backwards-compatible alias (pre-TE name).
jacobian_to_host = point_to_host


def jacobian_batch_to_host(curve, arr) -> list:
    """(3, B, 16) HOST limb array (Jacobian, Montgomery) -> B affine points.

    Callers fetch the whole coordinate stack in ONE device->host
    transfer (`np.asarray(jnp.stack(coords))`) and convert here: through
    the tunneled TPU every `np.asarray` is a blocking ~29 ms RPC, so
    per-point fetches serialize a batch (measured: the P=128 IPA batch
    prover spent ~45 s/round fetching 2P points coordinate-by-
    coordinate — 768 RPCs — vs one)."""
    from .limbs import limbs_to_int

    f = curve.fq
    Rinv = f.R_inv
    arr = np.asarray(arr)
    B = arr.shape[1]
    out = []
    for b in range(B):
        x = limbs_to_int(arr[0, b]) * Rinv % f.p
        y = limbs_to_int(arr[1, b]) * Rinv % f.p
        z = limbs_to_int(arr[2, b]) * Rinv % f.p
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, -1, f.p)
        zi2 = zi * zi % f.p
        out.append((x * zi2 % f.p, y * zi2 % f.p * zi % f.p))
    return out


def jacobian_batch_ints(curve, arr) -> list:
    """(3, B, 16) HOST limb array (Jacobian, Montgomery) -> B Jacobian
    int tuples (X, Y, Z) in the normal domain — no inversions, so
    callers can keep adding host points (e.g. the IPA compact rounds'
    c*Q term) before one batched affine conversion."""
    from .limbs import limbs_to_int

    f = curve.fq
    Rinv = f.R_inv
    arr = np.asarray(arr)
    return [
        (
            limbs_to_int(arr[0, b]) * Rinv % f.p,
            limbs_to_int(arr[1, b]) * Rinv % f.p,
            limbs_to_int(arr[2, b]) * Rinv % f.p,
        )
        for b in range(arr.shape[1])
    ]


def pvary(x, axis_name):
    """Promote a replicated value to device-varying under shard_map.

    Needed for scan/fori carry inits built from constants inside a
    shard_map body: the carry's varying-manual-axes set must match the
    per-iteration output's, and constants start out unvaried. No-op
    outside shard_map (axis_name None)."""
    if axis_name is None:
        return x
    try:
        return jax.lax.pcast(x, axis_name, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, axis_name)


def pvary_point(P: Point, axis_name):
    return tuple(pvary(c, axis_name) for c in P)


@partial(jax.jit, static_argnums=0)
def batch_add(spec, P, Q):
    return add(spec, P, Q)


@partial(jax.jit, static_argnums=0)
def batch_double(spec, P):
    return double(spec, P)


def point_batch_to_host(curve, arr) -> list:
    """(C, B, 16) HOST limb array -> B affine points, model-aware:
    C=3 SW Jacobian (None = identity) or C=4 TE extended ((0,1) =
    identity). Batch counterpart of `point_to_host` for one-fetch
    callers (ops/msm.py::msm_many_tabled)."""
    from .limbs import limbs_to_int

    arr = np.asarray(arr)
    if arr.shape[0] == 4:  # TE extended: (X, Y, T, Z)
        f = curve.fq
        Rinv = f.R_inv
        out = []
        for b in range(arr.shape[1]):
            x = limbs_to_int(arr[0, b]) * Rinv % f.p
            y = limbs_to_int(arr[1, b]) * Rinv % f.p
            z = limbs_to_int(arr[3, b]) * Rinv % f.p
            zi = pow(z, -1, f.p)
            out.append((x * zi % f.p, y * zi % f.p))
        return out
    return jacobian_batch_to_host(curve, arr)


def point_batch_ints(curve, arr) -> list:
    """(C, B, 16) HOST limb array (Montgomery) -> B projective int
    tuples in the normal domain, model-aware: C=3 SW Jacobian (X, Y, Z)
    or C=4 TE extended (X, Y, T, Z) — both directly consumable by the
    host `proj_add`/`batch_to_affine` of the matching model."""
    from .limbs import limbs_to_int

    f = curve.fq
    Rinv = f.R_inv
    arr = np.asarray(arr)
    C_, B = arr.shape[0], arr.shape[1]
    return [
        tuple(limbs_to_int(arr[c, b]) * Rinv % f.p for c in range(C_))
        for b in range(B)
    ]
