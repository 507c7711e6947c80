"""Pallas TPU kernels: fused 256-bit field and group-law primitives.

The XLA path (ops/field.py + ops/curve.py) lowers one Montgomery mul to
~100 separate TPU kernels, so every group op is bandwidth/dispatch-bound
~2 orders of magnitude off VPU peak. These kernels fuse the entire
operation: limbs live as (B,)-wide vector registers inside one kernel,
carry chains are register ops, and HBM traffic is just the operands.

In-kernel layout: operands are (16, B) uint32 blocks (limb-major) so
each limb row is a fully-utilized (8, 128)-tiled vector of B lanes.
Callers pass (..., 16) arrays; wrappers transpose at the boundary.

Kernels:
  mont_mul    — CIOS Montgomery product (16-bit digits, ~1.3k vector ops)
  sw_madd     — complete mixed Jacobian addition (madd-2007-bl + edges)
  sw_add      — complete Jacobian addition (add-2007-bl + edges)
  sw_double   — Jacobian doubling (dbl-2007-bl)

All magnitude invariants match ops/field.py (products exact in uint32,
columns < 2^22).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import CurveSpec
from .field import FieldSpec
from .limbs import N_LIMBS

MASK16 = 0xFFFF  # python int: pallas kernels must not capture traced constants
NL = N_LIMBS
BLOCK = 1024  # lanes per kernel instance (8 sublanes x 128 lanes)


# ---------------------------------------------------------------------
# in-kernel helpers: field arithmetic on lists of 16 (B,) vectors
# ---------------------------------------------------------------------


def _k_mont_mul(fs: FieldSpec, a, b):
    """CIOS product of two 16-limb vectors (lists of (B,) uint32)."""
    p = [int(v) for v in fs.p_limbs]
    # -p^{-1} mod 2^16 is the low limb of -p^{-1} mod 2^256
    n0inv = int(fs.nprime_limbs[0])
    zero = jnp.zeros_like(a[0])
    t = [zero] * (2 * NL + 1)
    for i in range(NL):
        ai = a[i]
        for j in range(NL):
            prod = ai * b[j]
            t[i + j] = t[i + j] + (prod & MASK16)
            t[i + j + 1] = t[i + j + 1] + (prod >> 16)
    carry = zero
    for i in range(NL):
        ti = t[i] + carry
        m = (ti * n0inv) & MASK16
        prod0 = m * p[0]
        carry = (ti + (prod0 & MASK16)) >> 16
        t[i + 1] = t[i + 1] + (prod0 >> 16)
        for j in range(1, NL):
            prod = m * p[j]
            t[i + j] = t[i + j] + (prod & MASK16)
            t[i + j + 1] = t[i + j + 1] + (prod >> 16)
    r = t[NL: 2 * NL]
    r[0] = r[0] + carry
    # carry-normalize
    out = []
    c = zero
    for i in range(NL):
        v = r[i] + c
        out.append(v & MASK16)
        c = v >> 16
    return _k_cond_sub_p(fs, out, c)


def _k_cond_sub_p(fs: FieldSpec, r, extra):
    """Reduce r + extra*2^256 (< 2p) to canonical [0, p)."""
    p = [int(v) for v in fs.p_limbs]
    brw = jnp.zeros_like(r[0])
    d = []
    for i in range(NL):
        v = r[i] - p[i] - brw
        brw = (v >> 31) & 1  # borrow iff wrapped (operands < 2^17)
        d.append(v + (brw << 16))
    need = (extra > 0) | (brw == 0)
    return [jnp.where(need, di & MASK16, ri) for di, ri in zip(d, r)]


def _k_add(fs: FieldSpec, a, b):
    c = jnp.zeros_like(a[0])
    s = []
    for i in range(NL):
        v = a[i] + b[i] + c
        s.append(v & MASK16)
        c = v >> 16
    return _k_cond_sub_p(fs, s, c)


def _k_sub(fs: FieldSpec, a, b):
    p = [int(v) for v in fs.p_limbs]
    brw = jnp.zeros_like(a[0])
    d = []
    for i in range(NL):
        v = a[i] - b[i] - brw
        brw = (v >> 31) & 1
        d.append(v & MASK16)
    # if borrowed, add p back
    c = jnp.zeros_like(a[0])
    dp = []
    for i in range(NL):
        v = d[i] + p[i] + c
        dp.append(v & MASK16)
        c = v >> 16
    borrowed = brw > 0
    return [jnp.where(borrowed, x, y) for x, y in zip(dp, d)]


def _k_is_zero(a):
    acc = a[0]
    for i in range(1, NL):
        acc = acc | a[i]
    return acc == 0


def _k_eq(a, b):
    acc = a[0] ^ b[0]
    for i in range(1, NL):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


def _k_select(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _k_dbl(fs, a):
    return _k_add(fs, a, a)


def _read(ref):
    """(16, B) ref -> list of 16 (B,) vectors."""
    x = ref[:]
    return [x[i] for i in range(NL)]


def _write(ref, limbs):
    ref[:] = jnp.stack(limbs)


# ---------------------------------------------------------------------
# group-law bodies (shared between kernels)
# ---------------------------------------------------------------------


def _k_sw_double(cs: CurveSpec, X1, Y1, Z1):
    fs = cs.fq
    XX = _k_mont_mul(fs, X1, X1)
    YY = _k_mont_mul(fs, Y1, Y1)
    ZZ = _k_mont_mul(fs, Z1, Z1)
    YYYY = _k_mont_mul(fs, YY, YY)
    xpyy = _k_add(fs, X1, YY)
    S = _k_sub(fs, _k_mont_mul(fs, xpyy, xpyy), _k_add(fs, XX, YYYY))
    S = _k_add(fs, S, S)
    M = _k_add(fs, _k_add(fs, XX, XX), XX)
    if not cs.is_a_zero:
        a_v = [jnp.full_like(X1[0], int(v)) for v in cs.a_mont_limbs]
        ZZ2 = _k_mont_mul(fs, ZZ, ZZ)
        M = _k_add(fs, M, _k_mont_mul(fs, a_v, ZZ2))
    M2 = _k_mont_mul(fs, M, M)
    X3 = _k_sub(fs, M2, _k_add(fs, S, S))
    e8 = _k_dbl(fs, _k_dbl(fs, _k_dbl(fs, YYYY)))
    Y3 = _k_sub(fs, _k_mont_mul(fs, M, _k_sub(fs, S, X3)), e8)
    ypz = _k_add(fs, Y1, Z1)
    Z3 = _k_sub(fs, _k_mont_mul(fs, ypz, ypz), _k_add(fs, YY, ZZ))
    return X3, Y3, Z3


def _k_sw_add(cs: CurveSpec, P, Q):
    """Complete Jacobian + Jacobian."""
    fs = cs.fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    p_inf = _k_is_zero(Z1)
    q_inf = _k_is_zero(Z2)
    Z1Z1 = _k_mont_mul(fs, Z1, Z1)
    Z2Z2 = _k_mont_mul(fs, Z2, Z2)
    U1 = _k_mont_mul(fs, X1, Z2Z2)
    U2 = _k_mont_mul(fs, X2, Z1Z1)
    S1 = _k_mont_mul(fs, _k_mont_mul(fs, Y1, Z2), Z2Z2)
    S2 = _k_mont_mul(fs, _k_mont_mul(fs, Y2, Z1), Z1Z1)
    H = _k_sub(fs, U2, U1)
    rr0 = _k_sub(fs, S2, S1)
    x_eq = _k_is_zero(H)
    y_eq = _k_is_zero(rr0)
    rr = _k_add(fs, rr0, rr0)
    twoH = _k_add(fs, H, H)
    I = _k_mont_mul(fs, twoH, twoH)
    J = _k_mont_mul(fs, H, I)
    V = _k_mont_mul(fs, U1, I)
    rr2 = _k_mont_mul(fs, rr, rr)
    X3 = _k_sub(fs, rr2, _k_add(fs, J, _k_add(fs, V, V)))
    S1J = _k_mont_mul(fs, S1, J)
    Y3 = _k_sub(
        fs, _k_mont_mul(fs, rr, _k_sub(fs, V, X3)), _k_add(fs, S1J, S1J)
    )
    zpz = _k_add(fs, Z1, Z2)
    w = _k_sub(fs, _k_mont_mul(fs, zpz, zpz), _k_add(fs, Z1Z1, Z2Z2))
    Z3 = _k_mont_mul(fs, w, H)

    dX, dY, dZ = _k_sw_double(cs, X1, Y1, Z1)
    both = x_eq & y_eq
    X3 = _k_select(both, dX, X3)
    Y3 = _k_select(both, dY, Y3)
    Z3 = _k_select(both, dZ, Z3)
    cancel = x_eq & ~y_eq & ~p_inf & ~q_inf
    zero = [jnp.zeros_like(X1[0])] * NL
    Z3 = _k_select(cancel, zero, Z3)
    X3 = _k_select(p_inf, X2, X3)
    Y3 = _k_select(p_inf, Y2, Y3)
    Z3 = _k_select(p_inf, Z2, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)
    return X3, Y3, Z3


def _k_sw_madd(cs: CurveSpec, P, Qx, Qy, q_inf):
    """Complete Jacobian + affine (madd-2007-bl)."""
    fs = cs.fq
    X1, Y1, Z1 = P
    p_inf = _k_is_zero(Z1)
    Z1Z1 = _k_mont_mul(fs, Z1, Z1)
    U2 = _k_mont_mul(fs, Qx, Z1Z1)
    S2 = _k_mont_mul(fs, _k_mont_mul(fs, Qy, Z1), Z1Z1)
    H = _k_sub(fs, U2, X1)
    rr0 = _k_sub(fs, S2, Y1)
    x_eq = _k_is_zero(H)
    y_eq = _k_is_zero(rr0)
    rr = _k_add(fs, rr0, rr0)
    twoH = _k_add(fs, H, H)
    HH = _k_mont_mul(fs, H, H)
    I = _k_mont_mul(fs, twoH, twoH)
    J = _k_mont_mul(fs, H, I)
    V = _k_mont_mul(fs, X1, I)
    rr2 = _k_mont_mul(fs, rr, rr)
    X3 = _k_sub(fs, rr2, _k_add(fs, J, _k_add(fs, V, V)))
    S1J = _k_mont_mul(fs, Y1, J)
    Y3 = _k_sub(
        fs, _k_mont_mul(fs, rr, _k_sub(fs, V, X3)), _k_add(fs, S1J, S1J)
    )
    zph = _k_add(fs, Z1, H)
    Z3 = _k_sub(
        fs, _k_mont_mul(fs, zph, zph), _k_add(fs, Z1Z1, HH)
    )

    dX, dY, dZ = _k_sw_double(cs, X1, Y1, Z1)
    both = x_eq & y_eq
    X3 = _k_select(both, dX, X3)
    Y3 = _k_select(both, dY, Y3)
    Z3 = _k_select(both, dZ, Z3)
    cancel = x_eq & ~y_eq & ~p_inf & ~q_inf
    zero = [jnp.zeros_like(X1[0])] * NL
    Z3 = _k_select(cancel, zero, Z3)
    one = [jnp.full_like(X1[0], int(v)) for v in cs.fq.r_limbs]
    qz = _k_select(q_inf, zero, one)
    X3 = _k_select(p_inf, Qx, X3)
    Y3 = _k_select(p_inf, Qy, Y3)
    Z3 = _k_select(p_inf, qz, Z3)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)
    return X3, Y3, Z3


# ---------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _grid_specs(k):
    return [
        pl.BlockSpec((NL, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(k)
    ]


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


@partial(jax.jit, static_argnums=(0,))
def mont_mul_tiled(fs: FieldSpec, a, b):
    """Pallas Montgomery product; a, b: (m, 16) uint32, m % BLOCK == 0."""
    m = a.shape[0]

    def kern(a_ref, b_ref, o_ref):
        _write(o_ref, _k_mont_mul(fs, _read(a_ref), _read(b_ref)))

    out = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(2),
        out_specs=_grid_specs(1)[0],
        out_shape=jax.ShapeDtypeStruct((NL, m), jnp.uint32),
        interpret=_interpret(),
    )(a.T, b.T)
    return out.T


def _point_io(arrs):
    """Transpose a list of (m, 16) arrays to kernel layout (16, m)."""
    return [x.T for x in arrs]


@partial(jax.jit, static_argnums=(0,))
def sw_madd_tiled(cs: CurveSpec, X1, Y1, Z1, Qx, Qy, q_inf):
    """Pallas complete mixed addition on (m, 16) arrays (+ (m,) mask)."""
    m = X1.shape[0]

    def kern(x_ref, y_ref, z_ref, qx_ref, qy_ref, qi_ref, ox, oy, oz):
        P = (_read(x_ref), _read(y_ref), _read(z_ref))
        qi = qi_ref[:][0] > 0
        X3, Y3, Z3 = _k_sw_madd(
            cs, P, _read(qx_ref), _read(qy_ref), qi
        )
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    qi2 = q_inf.astype(jnp.uint32)[None, :]  # (1, m)
    qi_spec = pl.BlockSpec(
        (1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(5) + [qi_spec],
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T, Qx.T, Qy.T, qi2)
    return tuple(o.T for o in outs)


@partial(jax.jit, static_argnums=(0,))
def sw_add_tiled(cs: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """Pallas complete Jacobian addition on (m, 16) arrays."""
    m = X1.shape[0]

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (_read(x1), _read(y1), _read(z1))
        Q = (_read(x2), _read(y2), _read(z2))
        X3, Y3, Z3 = _k_sw_add(cs, P, Q)
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(6),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T, X2.T, Y2.T, Z2.T)
    return tuple(o.T for o in outs)


@partial(jax.jit, static_argnums=(0, 7))
def sw_double_k_add_tiled(cs: CurveSpec, X1, Y1, Z1, X2, Y2, Z2, k: int):
    """(2^k * P) + Q fused into one kernel launch (Horner steps)."""
    m = X1.shape[0]

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = [_read(x1), _read(y1), _read(z1)]
        for _ in range(k):
            P = list(_k_sw_double(cs, *P))
        Q = (_read(x2), _read(y2), _read(z2))
        X3, Y3, Z3 = _k_sw_add(cs, tuple(P), Q)
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(6),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T, X2.T, Y2.T, Z2.T)
    return tuple(o.T for o in outs)


@partial(jax.jit, static_argnums=(0,))
def sw_double_tiled(cs: CurveSpec, X1, Y1, Z1):
    m = X1.shape[0]

    def kern(x1, y1, z1, ox, oy, oz):
        X3, Y3, Z3 = _k_sw_double(cs, _read(x1), _read(y1), _read(z1))
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(3),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T)
    return tuple(o.T for o in outs)


# ---------------------------------------------------------------------
# Complete projective group law (Renes-Costello-Batina, EUROCRYPT 2016)
# ---------------------------------------------------------------------
# Homogeneous (X:Y:Z) coordinates on odd-order short-Weierstrass curves;
# identity is (0:1:0) and the formulas are COMPLETE: no doubling branch,
# no identity selects, valid for every input pair. Mixed add costs
# 8M + 2 small-const muls for a=0 (vs 20M for the branch-free Jacobian
# madd above, whose embedded double ran unconditionally).  These bodies
# power the v2 MSM kernels (ops/kernels2.py); they replace the same
# reference primitive (ark_ec group law, used by VariableBaseMSM).


def _k_mul_small(fs: FieldSpec, x, k: int):
    """x * k for a small positive constant k (double-and-add, exact)."""
    assert k > 0
    bits = bin(k)[2:]
    acc = x
    for bit in bits[1:]:
        acc = _k_dbl(fs, acc)
        if bit == "1":
            acc = _k_add(fs, acc, x)
    return acc


def _k_mul_const(fs: FieldSpec, x, mont_limbs, small: int | None):
    """x * const: cheap double-and-add when the plain constant is small,
    else a full Montgomery product with the broadcast constant."""
    if small is not None:
        return _k_mul_small(fs, x, small)
    c = [jnp.full_like(x[0], int(v)) for v in mont_limbs]
    return _k_mont_mul(fs, x, c)


def _k_b3(cs: CurveSpec):
    return cs.b3_mont_limbs, cs.b3_small


def _k_a(cs: CurveSpec):
    return cs.a_mont_limbs, cs.a_small


def _k_rcb_add(cs: CurveSpec, P, Q):
    """Complete projective P + Q (RCB Alg 1 general a / Alg 7 for a=0)."""
    fs = cs.fq
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul, add, sub = _k_mont_mul, _k_add, _k_sub
    b3l, b3s = _k_b3(cs)

    t0 = mul(fs, X1, X2)
    t1 = mul(fs, Y1, Y2)
    t2 = mul(fs, Z1, Z2)
    t3 = mul(fs, add(fs, X1, Y1), add(fs, X2, Y2))
    t3 = sub(fs, t3, add(fs, t0, t1))  # X1Y2 + X2Y1
    t4 = mul(fs, add(fs, X1, Z1), add(fs, X2, Z2))
    t4 = sub(fs, t4, add(fs, t0, t2))  # X1Z2 + X2Z1
    t5 = mul(fs, add(fs, Y1, Z1), add(fs, Y2, Z2))
    t5 = sub(fs, t5, add(fs, t1, t2))  # Y1Z2 + Y2Z1
    if cs.is_a_zero:
        # Alg 7
        X3 = _k_mul_const(fs, t2, b3l, b3s)  # b3*Z1Z2
        Z3 = add(fs, t1, X3)
        t1 = sub(fs, t1, X3)
        Y3 = _k_mul_const(fs, t4, b3l, b3s)  # b3*(X1Z2+X2Z1)
        t0_3 = add(fs, add(fs, t0, t0), t0)  # 3*X1X2
        X3 = mul(fs, t5, Y3)
        t2 = mul(fs, t3, t1)
        X3 = sub(fs, t2, X3)
        Y3 = mul(fs, Y3, t0_3)
        t1 = mul(fs, t1, Z3)
        Y3 = add(fs, t1, Y3)
        t0_3 = mul(fs, t0_3, t3)
        Z3 = mul(fs, Z3, t5)
        Z3 = add(fs, Z3, t0_3)
        return X3, Y3, Z3
    al, asm = _k_a(cs)
    # Alg 1
    Z3 = _k_mul_const(fs, t4, al, asm)  # a*t4
    X3 = _k_mul_const(fs, t2, b3l, b3s)  # b3*t2
    Z3 = add(fs, X3, Z3)
    X3 = sub(fs, t1, Z3)
    Z3 = add(fs, t1, Z3)
    Y3 = mul(fs, X3, Z3)
    t1 = add(fs, add(fs, t0, t0), t0)  # 3t0
    t2 = _k_mul_const(fs, t2, al, asm)  # a*t2
    t4 = _k_mul_const(fs, t4, b3l, b3s)  # b3*t4
    t1 = add(fs, t1, t2)  # 3t0 + a*t2
    t2 = sub(fs, t0, t2)
    t2 = _k_mul_const(fs, t2, al, asm)
    t4 = add(fs, t4, t2)
    t0 = mul(fs, t1, t4)
    Y3 = add(fs, Y3, t0)
    t0 = mul(fs, t5, t4)
    X3 = mul(fs, t3, X3)
    X3 = sub(fs, X3, t0)
    t0 = mul(fs, t3, t1)
    Z3 = mul(fs, t5, Z3)
    Z3 = add(fs, Z3, t0)
    return X3, Y3, Z3


def _k_rcb_madd(cs: CurveSpec, P, Qx, Qy, q_inf):
    """Complete projective P + affine Q (RCB Alg 2 / Alg 8); q_inf lanes
    pass P through (the affine encoding cannot express the identity)."""
    fs = cs.fq
    X1, Y1, Z1 = P
    mul, add, sub = _k_mont_mul, _k_add, _k_sub
    b3l, b3s = _k_b3(cs)

    t0 = mul(fs, X1, Qx)
    t1 = mul(fs, Y1, Qy)
    t3 = mul(fs, add(fs, Qx, Qy), add(fs, X1, Y1))
    t3 = sub(fs, t3, add(fs, t0, t1))  # X1Y2 + X2Y1
    t4 = add(fs, mul(fs, Qx, Z1), X1)  # X1 + X2Z1
    t5 = add(fs, mul(fs, Qy, Z1), Y1)  # Y1 + Y2Z1
    if cs.is_a_zero:
        # Alg 8
        t0_3 = add(fs, add(fs, t0, t0), t0)  # 3*X1X2
        t2 = _k_mul_const(fs, Z1, b3l, b3s)  # b3*Z1
        Z3 = add(fs, t1, t2)
        t1 = sub(fs, t1, t2)
        Y3 = _k_mul_const(fs, t4, b3l, b3s)
        X3 = mul(fs, t5, Y3)
        t2 = mul(fs, t3, t1)
        X3 = sub(fs, t2, X3)
        Y3 = mul(fs, Y3, t0_3)
        t1 = mul(fs, t1, Z3)
        Y3 = add(fs, t1, Y3)
        t0_3 = mul(fs, t0_3, t3)
        Z3 = mul(fs, Z3, t5)
        Z3 = add(fs, Z3, t0_3)
    else:
        al, asm = _k_a(cs)
        # Alg 2
        Z3 = _k_mul_const(fs, t4, al, asm)
        X3 = _k_mul_const(fs, Z1, b3l, b3s)
        Z3 = add(fs, X3, Z3)
        X3 = sub(fs, t1, Z3)
        Z3 = add(fs, t1, Z3)
        Y3 = mul(fs, X3, Z3)
        t1 = add(fs, add(fs, t0, t0), t0)
        t2 = _k_mul_const(fs, Z1, al, asm)
        t4 = _k_mul_const(fs, t4, b3l, b3s)
        t1 = add(fs, t1, t2)
        t2 = sub(fs, t0, t2)
        t2 = _k_mul_const(fs, t2, al, asm)
        t4 = add(fs, t4, t2)
        t0 = mul(fs, t1, t4)
        Y3 = add(fs, Y3, t0)
        t0 = mul(fs, t5, t4)
        X3 = mul(fs, t3, X3)
        X3 = sub(fs, X3, t0)
        t0 = mul(fs, t3, t1)
        Z3 = mul(fs, t5, Z3)
        Z3 = add(fs, Z3, t0)
    X3 = _k_select(q_inf, X1, X3)
    Y3 = _k_select(q_inf, Y1, Y3)
    Z3 = _k_select(q_inf, Z1, Z3)
    return X3, Y3, Z3


def _k_rcb_double(cs: CurveSpec, X1, Y1, Z1):
    """Complete projective doubling (RCB Alg 3 / Alg 9)."""
    fs = cs.fq
    mul, add, sub = _k_mont_mul, _k_add, _k_sub
    b3l, b3s = _k_b3(cs)
    if cs.is_a_zero:
        # Alg 9
        t0 = mul(fs, Y1, Y1)
        Z3 = add(fs, t0, t0)
        Z3 = add(fs, Z3, Z3)
        Z3 = add(fs, Z3, Z3)  # 8Y^2
        t1 = mul(fs, Y1, Z1)
        t2 = mul(fs, Z1, Z1)
        t2 = _k_mul_const(fs, t2, b3l, b3s)
        X3 = mul(fs, t2, Z3)
        Y3 = add(fs, t0, t2)
        Z3 = mul(fs, t1, Z3)
        t1 = add(fs, t2, t2)
        t2 = add(fs, t1, t2)
        t0 = sub(fs, t0, t2)
        Y3 = mul(fs, t0, Y3)
        Y3 = add(fs, X3, Y3)
        t1 = mul(fs, X1, Y1)
        X3 = mul(fs, t0, t1)
        X3 = add(fs, X3, X3)
        return X3, Y3, Z3
    al, asm = _k_a(cs)
    # Alg 3
    t0 = mul(fs, X1, X1)
    t1 = mul(fs, Y1, Y1)
    t2 = mul(fs, Z1, Z1)
    t3 = mul(fs, X1, Y1)
    t3 = add(fs, t3, t3)
    Z3 = mul(fs, X1, Z1)
    Z3 = add(fs, Z3, Z3)
    X3 = _k_mul_const(fs, Z3, al, asm)
    Y3 = _k_mul_const(fs, t2, b3l, b3s)
    Y3 = add(fs, X3, Y3)
    X3 = sub(fs, t1, Y3)
    Y3 = add(fs, t1, Y3)
    Y3 = mul(fs, X3, Y3)
    X3 = mul(fs, t3, X3)
    Z3 = _k_mul_const(fs, Z3, b3l, b3s)
    t2 = _k_mul_const(fs, t2, al, asm)
    t3 = sub(fs, t0, t2)
    t3 = _k_mul_const(fs, t3, al, asm)
    t3 = add(fs, t3, Z3)
    Z3 = add(fs, t0, t0)
    t0 = add(fs, Z3, t0)
    t0 = add(fs, t0, t2)
    t0 = mul(fs, t0, t3)
    Y3 = add(fs, Y3, t0)
    t2 = mul(fs, Y1, Z1)
    t2 = add(fs, t2, t2)
    t0 = mul(fs, t2, t3)
    X3 = sub(fs, X3, t0)
    Z3 = mul(fs, t2, t1)
    Z3 = add(fs, Z3, Z3)
    Z3 = add(fs, Z3, Z3)
    return X3, Y3, Z3


def _k_te_add(ts, P, Q):
    """Unified twisted-Edwards EXTENDED addition (Hisil-Wong-Carter-
    Dawson) on 4-coord (X:Y:T:Z) points — mirrors the host model
    curves/models.py::TECurve.proj_add and the XLA path
    ops/curve.py::_te_add_core operation-for-operation. Unified: one
    formula covers doubling and the identity (0:1:0:1), no branches
    (complete for the repo's curve25519 parameters, same trust base as
    the host law). Q[3] may be None for a known Z2 = 1 (mixed add)."""
    fs = ts.fq
    X1, Y1, T1, Z1 = P
    X2, Y2, T2, Z2 = Q
    mul, add, sub = _k_mont_mul, _k_add, _k_sub
    A = mul(fs, X1, X2)
    B = mul(fs, Y1, Y2)
    C = _k_mul_const(fs, mul(fs, T1, T2), ts.d_mont_limbs, None)
    D = mul(fs, Z1, Z2) if Z2 is not None else Z1
    E = sub(fs, mul(fs, add(fs, X1, Y1), add(fs, X2, Y2)), add(fs, A, B))
    F = sub(fs, D, C)
    G = add(fs, D, C)
    H = sub(fs, B, _k_mul_const(fs, A, ts.a_mont_limbs, None))
    return (
        mul(fs, E, F),  # X3
        mul(fs, G, H),  # Y3
        mul(fs, E, H),  # T3
        mul(fs, F, G),  # Z3
    )


def _k_te_madd(ts, P, Qx, Qy, q_inf):
    """Unified TE extended + affine (Z2 = 1, T2 = x*y in-kernel — 10
    full muls vs the SW RCB madd's 13); q_inf lanes pass P through
    (the packed-affine y = 0 encoding marks identity rows; a y = 0
    point has order 4 and cannot appear in the prime-order subgroup)."""
    fs = ts.fq
    T2 = _k_mont_mul(fs, Qx, Qy)
    R = _k_te_add(ts, P, (Qx, Qy, T2, None))
    return tuple(_k_select(q_inf, a, b) for a, b in zip(P, R))


def _k_te_double(ts, P):
    """TE doubling via the unified addition (kept structurally identical
    to the host model's proj_double = proj_add(P, P))."""
    return _k_te_add(ts, P, P)


@partial(jax.jit, static_argnums=(0,))
def rcb_add_tiled(cs: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """Pallas complete projective addition on (m, 16) arrays (RCB)."""
    m = X1.shape[0]

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (_read(x1), _read(y1), _read(z1))
        Q = (_read(x2), _read(y2), _read(z2))
        X3, Y3, Z3 = _k_rcb_add(cs, P, Q)
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(6),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T, X2.T, Y2.T, Z2.T)
    return tuple(o.T for o in outs)


@partial(jax.jit, static_argnums=(0,))
def rcb_double_tiled(cs: CurveSpec, X1, Y1, Z1):
    """Pallas complete projective doubling on (m, 16) arrays (RCB)."""
    m = X1.shape[0]

    def kern(x1, y1, z1, ox, oy, oz):
        X3, Y3, Z3 = _k_rcb_double(cs, _read(x1), _read(y1), _read(z1))
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(3),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T)
    return tuple(o.T for o in outs)


# ---------------------------------------------------------------------
# Twisted-Edwards tiled kernels (extended coords, unified HWCD)
# ---------------------------------------------------------------------
# Same tiled plumbing as the SW kernels above, 4 coords per point. These
# power the TE dispatch of ops/curve.py / ops/proj.py (the previous TE
# path ran only the field muls through Pallas — mont_mul_fast batches —
# with the group-law structure as XLA elementwise ops, measured ~11x
# slower end-to-end on v1 MSM scans).


def _te_call(kern, n_in, arrs, m):
    return tuple(
        o.T
        for o in pl.pallas_call(
            kern,
            grid=(m // BLOCK,),
            in_specs=_grid_specs(n_in),
            out_specs=tuple(_grid_specs(4)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(4)
            ),
            interpret=_interpret(),
        )(*(a.T for a in arrs))
    )


@partial(jax.jit, static_argnums=(0,))
def te_add_tiled(ts, X1, Y1, T1, Z1, X2, Y2, T2, Z2):
    """Pallas unified TE extended addition on (m, 16) arrays."""

    def kern(x1, y1, t1, z1, x2, y2, t2, z2, ox, oy, ot, oz):
        P = (_read(x1), _read(y1), _read(t1), _read(z1))
        Q = (_read(x2), _read(y2), _read(t2), _read(z2))
        for ref, c in zip((ox, oy, ot, oz), _k_te_add(ts, P, Q)):
            _write(ref, c)

    return _te_call(kern, 8, (X1, Y1, T1, Z1, X2, Y2, T2, Z2),
                    X1.shape[0])


@partial(jax.jit, static_argnums=(0,))
def te_double_tiled(ts, X1, Y1, T1, Z1):
    """Pallas unified TE extended doubling on (m, 16) arrays."""

    def kern(x1, y1, t1, z1, ox, oy, ot, oz):
        P = (_read(x1), _read(y1), _read(t1), _read(z1))
        for ref, c in zip((ox, oy, ot, oz), _k_te_double(ts, P)):
            _write(ref, c)

    return _te_call(kern, 4, (X1, Y1, T1, Z1), X1.shape[0])


@partial(jax.jit, static_argnums=(0, 9))
def te_double_k_add_tiled(ts, X1, Y1, T1, Z1, X2, Y2, T2, Z2, k: int):
    """(2^k * P) + Q fused into one TE kernel launch (Horner steps)."""

    def kern(x1, y1, t1, z1, x2, y2, t2, z2, ox, oy, ot, oz):
        P = (_read(x1), _read(y1), _read(t1), _read(z1))
        for _ in range(k):
            P = _k_te_double(ts, P)
        Q = (_read(x2), _read(y2), _read(t2), _read(z2))
        for ref, c in zip((ox, oy, ot, oz), _k_te_add(ts, P, Q)):
            _write(ref, c)

    return _te_call(kern, 8, (X1, Y1, T1, Z1, X2, Y2, T2, Z2),
                    X1.shape[0])


@partial(jax.jit, static_argnums=(0,))
def te_madd_tiled(ts, X1, Y1, T1, Z1, Qx, Qy, q_inf):
    """Pallas unified TE extended + affine on (m, 16) arrays (+ mask)."""
    m = X1.shape[0]

    def kern(x1, y1, t1, z1, qx_ref, qy_ref, qi_ref, ox, oy, ot, oz):
        P = (_read(x1), _read(y1), _read(t1), _read(z1))
        qi = qi_ref[:][0] > 0
        for ref, c in zip(
            (ox, oy, ot, oz),
            _k_te_madd(ts, P, _read(qx_ref), _read(qy_ref), qi),
        ):
            _write(ref, c)

    qi2 = q_inf.astype(jnp.uint32)[None, :]  # (1, m)
    qi_spec = pl.BlockSpec(
        (1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(6) + [qi_spec],
        out_specs=tuple(_grid_specs(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(4)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, T1.T, Z1.T, Qx.T, Qy.T, qi2)
    return tuple(o.T for o in outs)


@partial(jax.jit, static_argnums=(0, 7))
def rcb_double_k_add_tiled(cs: CurveSpec, X1, Y1, Z1, X2, Y2, Z2,
                           k: int):
    """(2^k * P) + Q fused into ONE launch, RCB complete projective
    coords (the v2 MSM's window-recombination Horner step)."""
    m = X1.shape[0]

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        P = (_read(x1), _read(y1), _read(z1))
        for _ in range(k):
            P = _k_rcb_double(cs, *P)
        Q = (_read(x2), _read(y2), _read(z2))
        X3, Y3, Z3 = _k_rcb_add(cs, P, Q)
        _write(ox, X3)
        _write(oy, Y3)
        _write(oz, Z3)

    outs = pl.pallas_call(
        kern,
        grid=(m // BLOCK,),
        in_specs=_grid_specs(6),
        out_specs=tuple(_grid_specs(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NL, m), jnp.uint32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(X1.T, Y1.T, Z1.T, X2.T, Y2.T, Z2.T)
    return tuple(o.T for o in outs)
