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
