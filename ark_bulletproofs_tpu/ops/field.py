"""Device (JAX) 256-bit prime-field arithmetic in Montgomery form.

Replaces the reference's ark-ff `Fp256<MontBackend<_,4>>` (4 x u64 limbs,
x86 asm — Cargo.toml:32-35 of the reference) with a TPU-native layout:
16 x 16-bit limbs in uint32 lanes, batched over arbitrary leading axes.
All ops are branch-free (no data-dependent control flow) so they trace
into a single fused XLA computation; carries are short unrolled chains
of static-shape lane ops on the VPU.

Montgomery radix R = 2^256 (same as arkworks), so host Montgomery values
and device values agree limb-for-limb after radix re-chunking.

Key magnitude invariants (why uint32 never overflows):
  - limb product a_i * b_j < 2^32             (exact in uint32)
  - conv column sums < 32 * 2^16 = 2^21
  - REDC adds < 16 rounds * 2 * 2^16 = 2^21; columns stay < 2^22
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, N_LIMBS, int_to_limbs

U32 = jnp.uint32
I32 = jnp.int32


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants, hashable so jitted fns specialize on it."""

    name: str
    p: int  # modulus (python int, for host-side checks)
    p_limbs: tuple  # (16,) ints
    n0inv: int  # -p^{-1} mod 2^16
    r_limbs: tuple  # R mod p      (Montgomery one)
    r2_limbs: tuple  # R^2 mod p   (to-Montgomery factor)

    @classmethod
    def create(cls, name: str, p: int) -> "FieldSpec":
        R = (1 << 256) % p
        R2 = R * R % p
        n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        return cls(
            name=name,
            p=p,
            p_limbs=tuple(int(v) for v in int_to_limbs(p)),
            n0inv=int(n0inv),
            r_limbs=tuple(int(v) for v in int_to_limbs(R)),
            r2_limbs=tuple(int(v) for v in int_to_limbs(R2)),
        )

    # numpy views (not stored as arrays to keep the dataclass hashable)
    @property
    def p_arr(self) -> np.ndarray:
        return np.array(self.p_limbs, dtype=np.uint32)

    @property
    def r_arr(self) -> np.ndarray:
        return np.array(self.r_limbs, dtype=np.uint32)

    @property
    def r2_arr(self) -> np.ndarray:
        return np.array(self.r2_limbs, dtype=np.uint32)


_SPECS: dict[str, FieldSpec] = {}


def spec_for(field) -> FieldSpec:
    """FieldSpec for an ark_bulletproofs_tpu.fields.Field."""
    s = _SPECS.get(field.name)
    if s is None:
        s = FieldSpec.create(field.name, field.p)
        _SPECS[field.name] = s
    return s


# --- carry / borrow chains (unrolled static loops) ----------------------


def carry_norm(t):
    """Propagate carries over the last axis; returns (limbs, carry_out).

    Input columns may hold values up to 2^32 - 2^16; output limbs are
    canonical 16-bit.
    """
    n = t.shape[-1]
    c = jnp.zeros(t.shape[:-1], U32)
    out = []
    for i in range(n):
        v = t[..., i] + c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return jnp.stack(out, axis=-1), c


def _sub_chain(a, b):
    """Limbwise a - b with borrow propagation (canonical 16-bit inputs).

    Returns (diff_limbs, borrow_out in {0,1}); diff represents
    a - b + borrow_out * 2^256.
    """
    brw = jnp.zeros(a.shape[:-1], I32)
    out = []
    for i in range(N_LIMBS):
        v = a[..., i].astype(I32) - b[..., i].astype(I32) - brw
        brw = (v < 0).astype(I32)
        out.append((v + (brw << LIMB_BITS)).astype(U32))
    return jnp.stack(out, axis=-1), brw.astype(U32)


def _add_const_chain(a, const_arr):
    """a + const (broadcast (16,) array), dropping the final carry."""
    c = jnp.zeros(a.shape[:-1], U32)
    out = []
    for i in range(N_LIMBS):
        v = a[..., i] + jnp.uint32(const_arr[i]) + c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def _cond_sub_p(spec: FieldSpec, r, extra):
    """Reduce r + extra * 2^256 (< 2p) to canonical [0, p)."""
    p_arr = jnp.asarray(spec.p_arr)
    d, borrow = _sub_chain(r, jnp.broadcast_to(p_arr, r.shape))
    need = (extra > 0) | (borrow == 0)
    return jnp.where(need[..., None], d, r)


# --- field ops ----------------------------------------------------------


def add(spec: FieldSpec, a, b):
    s, top = carry_norm(a + b)
    return _cond_sub_p(spec, s, top)


def sub(spec: FieldSpec, a, b):
    d, borrow = _sub_chain(a, b)
    d_plus_p = _add_const_chain(d, spec.p_arr)
    return jnp.where((borrow > 0)[..., None], d_plus_p, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a * b * R^{-1} mod p (CIOS with 16-bit digits).

    This is the hot primitive: every group-law mul lowers to one call.
    Schoolbook convolution with hi/lo split products, then 16 REDC rounds.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    t = jnp.zeros(shape + (2 * N_LIMBS,), U32)
    for i in range(N_LIMBS):
        prod = a[..., i: i + 1] * b  # (..., 16) exact uint32
        t = t.at[..., i: i + N_LIMBS].add(prod & MASK)
        t = t.at[..., i + 1: i + N_LIMBS + 1].add(prod >> LIMB_BITS)

    p_arr = jnp.asarray(spec.p_arr)
    n0inv = jnp.uint32(spec.n0inv)
    carry = jnp.zeros(shape, U32)
    for i in range(N_LIMBS):
        ti = t[..., i] + carry
        m = (ti * n0inv) & MASK
        prod = m[..., None] * p_arr  # (..., 16)
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        carry = (ti + lo[..., 0]) >> LIMB_BITS
        upper = min(i + N_LIMBS, 2 * N_LIMBS)
        t = t.at[..., i + 1: upper].add(lo[..., 1: upper - i])
        t = t.at[..., i + 1: i + N_LIMBS + 1].add(hi)

    r = t[..., N_LIMBS:]
    r = r.at[..., 0].add(carry)
    r, top = carry_norm(r)
    return _cond_sub_p(spec, r, top)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, jnp.asarray(spec.r2_arr))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical limbs (multiply by 1)."""
    one = jnp.zeros(N_LIMBS, U32).at[0].set(1)
    return mont_mul(spec, a, one)


def is_zero(a):
    """(...,) bool: all limbs zero."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """where(mask, a, b) with mask shaped (...,) over limb arrays."""
    return jnp.where(mask[..., None], a, b)


def mont_one(spec: FieldSpec, shape=()):
    return jnp.broadcast_to(jnp.asarray(spec.r_arr), shape + (N_LIMBS,))


def zero(shape=()):
    return jnp.zeros(shape + (N_LIMBS,), U32)


def double_k(spec: FieldSpec, a, k: int = 1):
    """a * 2^k via k doublings (used for small-constant multiples)."""
    for _ in range(k):
        a = add(spec, a, a)
    return a


def mul_small(spec: FieldSpec, a, c: int):
    """a * c for a small non-negative int constant c (double-and-add)."""
    if c == 0:
        return jnp.zeros_like(a)
    acc = None
    addend = a
    while c:
        if c & 1:
            acc = addend if acc is None else add(spec, acc, addend)
        c >>= 1
        if c:
            addend = add(spec, addend, addend)
    return acc


@partial(jax.jit, static_argnums=0)
def batch_mont_mul(spec: FieldSpec, a, b):
    return mont_mul(spec, a, b)


@partial(jax.jit, static_argnums=0)
def batch_add(spec: FieldSpec, a, b):
    return add(spec, a, b)


@partial(jax.jit, static_argnums=0)
def batch_sub(spec: FieldSpec, a, b):
    return sub(spec, a, b)
