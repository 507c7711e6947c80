"""Device (JAX) 256-bit prime-field arithmetic in Montgomery form.

Replaces the reference's ark-ff `Fp256<MontBackend<_,4>>` (4 x u64 limbs,
x86 asm — reference Cargo.toml:32-35) with a TPU-native layout: 16 x
16-bit limbs in uint32 lanes, batched over arbitrary leading axes. All
ops are branch-free, shallow, and built from three compiler-friendly
primitives so the XLA graphs stay small (a point-add instantiates ~16
multiplies; MSM scans instantiate dozens of point-adds):

  1. `_conv16` — full 512-bit schoolbook product via an outer product and
     a cumsum "skew" identity (no scatter, no per-diagonal loop): padding
     each row of the (16, 16) product matrix with one zero column makes
     flat index 17*i + j equal 16*i + (i + j), so after a reshape to
     (17, 16) the anti-diagonal sums are a cumsum's diagonal and totals.
  2. `_carry` — carry normalization with two value-splitting passes plus a
     Kogge-Stone parallel carry-lookahead (log-depth, lane-parallel),
     instead of a 16-step sequential ripple.
  3. single-shot Montgomery REDC: m = (t * (-p^{-1} mod 2^256)) mod 2^256
     computed as one low convolution, then r = (t + m*p) / 2^256 — no
     16-round digit-serial loop.

Magnitude invariants (why uint32 never overflows):
  - limb product a_i * b_j < 2^32 (exact in uint32 lanes)
  - convolution columns < 32 * 2^16 = 2^21; t + m*p columns < 2^22

Montgomery radix R = 2^256 (same as arkworks), so host Montgomery values
and device values agree after radix re-chunking.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, N_LIMBS, int_to_limbs

U32 = jnp.uint32


def _limbs_of(x: int, n: int) -> tuple:
    return tuple(int((x >> (LIMB_BITS * i)) & 0xFFFF) for i in range(n))


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants, hashable so jitted fns specialize on it."""

    name: str
    p: int
    p_limbs: tuple  # (16,)
    nprime_limbs: tuple  # -p^{-1} mod 2^256, (16,)
    r_limbs: tuple  # R mod p (Montgomery one)
    r2_limbs: tuple  # R^2 mod p

    @classmethod
    def create(cls, name: str, p: int) -> "FieldSpec":
        R = (1 << 256) % p
        nprime = (-pow(p, -1, 1 << 256)) % (1 << 256)
        return cls(
            name=name,
            p=p,
            p_limbs=_limbs_of(p, N_LIMBS),
            nprime_limbs=_limbs_of(nprime, N_LIMBS),
            r_limbs=_limbs_of(R, N_LIMBS),
            r2_limbs=_limbs_of(R * R % p, N_LIMBS),
        )

    @property
    def p_arr(self) -> np.ndarray:
        return np.array(self.p_limbs, dtype=np.uint32)

    @property
    def nprime_arr(self) -> np.ndarray:
        return np.array(self.nprime_limbs, dtype=np.uint32)

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


# --- low-level primitives -----------------------------------------------


def _shr(x, k: int):
    """Shift limbs toward higher indices by k (zero fill at the bottom)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _skew_cols(m):
    """(..., 16, 16) product matrix -> (..., 32) anti-diagonal sums."""
    lead = m.shape[:-2]
    mp = jnp.concatenate([m, jnp.zeros(lead + (N_LIMBS, 1), U32)], axis=-1)
    resh = mp.reshape(lead + (N_LIMBS + 1, N_LIMBS))
    cum = jnp.cumsum(resh, axis=-2)
    diag = jnp.diagonal(cum, axis1=-2, axis2=-1)  # cols[b], b < 16
    total = cum[..., N_LIMBS, :]
    return jnp.concatenate([diag, total - diag], axis=-1)


def _conv16(a, b):
    """Full 16x16-limb convolution: (..., 32) columns < 2^21."""
    prod = a[..., :, None] * b[..., None, :]  # exact in uint32
    cols_lo = _skew_cols(prod & MASK)
    cols_hi = _skew_cols(prod >> LIMB_BITS)
    return cols_lo + _shr(cols_hi, 1)


def _ks(g, p):
    """Kogge-Stone prefix over (generate, propagate); returns carries-in."""
    n = g.shape[-1]
    k = 1
    while k < n:
        g = g | (p & _shr(g, k))
        p = p & _shr(p, k)
        k *= 2
    return _shr(g, 1), g[..., -1]  # carry into column i; carry out of top


def _carry(t):
    """Normalize columns (< 2^32 - 2^16) to 16-bit limbs.

    Returns (limbs, carry_out) where carry_out may exceed 1 for large
    inputs; callers rely on value-level bounds for its true range.
    """
    c = t >> LIMB_BITS
    u = (t & MASK) + _shr(c, 1)
    pend = c[..., -1]
    d = u >> LIMB_BITS
    x = (u & MASK) + _shr(d, 1)
    pend = pend + d[..., -1]
    g = x >> LIMB_BITS  # {0, 1}
    pr = ((x & MASK) == MASK).astype(U32)
    cin, cout = _ks(g, pr)
    out = (x + cin) & MASK
    return out, pend + cout


def _sub_borrow(a, b):
    """Limbwise a - b (canonical inputs) via borrow lookahead.

    Returns (diff_limbs, borrow_out in {0,1}); diff represents
    a - b + borrow_out * 2^256.
    """
    g = (a < b).astype(U32)
    pr = (a == b).astype(U32)
    bin_, bout = _ks(g, pr)
    out = (a - b - bin_) & MASK
    return out, bout


def _add_carry(a, b):
    """Limbwise a + b (canonical inputs) -> (limbs, carry_out in {0,1})."""
    s = a + b
    g = s >> LIMB_BITS
    pr = ((s & MASK) == MASK).astype(U32)
    cin, cout = _ks(g, pr)
    return (s + cin) & MASK, cout


def carry_norm(t):
    """Public alias used by curve/MSM code."""
    return _carry(t)


def _cond_sub_p(spec: FieldSpec, r, extra):
    """Reduce r + extra * 2^256 (value < 2p) to canonical [0, p)."""
    p_arr = jnp.asarray(spec.p_arr)
    d, borrow = _sub_borrow(r, jnp.broadcast_to(p_arr, r.shape))
    need = (extra > 0) | (borrow == 0)
    return jnp.where(need[..., None], d, r)


# --- field ops ----------------------------------------------------------


def add(spec: FieldSpec, a, b):
    s, top = _add_carry(a, b)
    return _cond_sub_p(spec, s, top)


def sub(spec: FieldSpec, a, b):
    d, borrow = _sub_borrow(a, b)
    dp, _ = _add_carry(d, jnp.broadcast_to(jnp.asarray(spec.p_arr), d.shape))
    return jnp.where((borrow > 0)[..., None], dp, d)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a * b * R^{-1} mod p (single-shot REDC)."""
    t = _conv16(a, b)  # (..., 32) columns < 2^21
    t_lo, _ = _carry(t[..., :N_LIMBS])  # canonical t mod 2^256 (drop carry)
    m_cols = _conv16(t_lo, jnp.asarray(spec.nprime_arr))
    m, _ = _carry(m_cols[..., :N_LIMBS])  # m = t * n' mod 2^256
    u = _conv16(m, jnp.asarray(spec.p_arr))
    s = t + u  # columns < 2^22; value ≡ 0 mod 2^256, < 2p * 2^256
    s_norm, c_out = _carry(s)
    r = s_norm[..., N_LIMBS:]
    return _cond_sub_p(spec, r, c_out)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def mont_mul_fast(spec: FieldSpec, a, b):
    """`mont_mul` routed through the Pallas CIOS kernel on TPU.

    The XLA elementwise path above lowers the 16x16-limb schoolbook to
    ~2000 vector ops/element with (…, 16)-minor layouts the TPU pads
    8x — measured ~250 ns/mul at n=2^16 (97.6 ms for one (6, n) stack)
    vs ~1 ns/mul through the (8, 128)-tiled kernel. Shapes are
    flattened to (m, 16), padded to the kernel BLOCK, and restored;
    CPU (tests) keeps the XLA path (interpret-mode Pallas is slower
    still)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return mont_mul(spec, a, b)
    from . import kernels as k

    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, N_LIMBS)
    b = jnp.broadcast_to(b, shape).reshape(-1, N_LIMBS)
    m = a.shape[0]
    pad = (-m) % k.BLOCK
    if pad:
        zp = ((0, pad), (0, 0))
        a = jnp.pad(a, zp)
        b = jnp.pad(b, zp)
    out = k.mont_mul_tiled(spec, a, b)
    if pad:
        out = out[:m]
    return out.reshape(shape)


def from_mont_fast(spec: FieldSpec, a):
    """`from_mont` through the Pallas kernel (see mont_mul_fast)."""
    one = jnp.zeros(N_LIMBS, U32).at[0].set(1)
    return mont_mul_fast(spec, a, jnp.broadcast_to(one, a.shape))


def to_mont(spec: FieldSpec, a):
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, jnp.asarray(spec.r2_arr))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical limbs (multiply by 1)."""
    one = jnp.zeros(N_LIMBS, U32).at[0].set(1)
    return mont_mul(spec, a, one)


def is_zero(a):
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
    """a * 2^k via k doublings (small-constant multiples)."""
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


def sum_mod(spec: FieldSpec, a, axis: int = 0):
    """Modular sum of limb vectors along `axis` (Montgomery-form linear).

    Column sums stay exact in uint32 for up to 2^15 addends per stage;
    larger axes are chunked. The (≤ n*p) wide total v = lo + c*2^256 is
    reduced via lo mod p + mont_mul(c, R^2)  (= c * 2^256 mod p).
    """
    a = jnp.moveaxis(a, axis, 0) if axis != 0 else a
    while a.shape[0] > 1:
        n = a.shape[0]
        chunk = min(n, 1 << 15)
        pad = (-n) % chunk
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], U32)], axis=0
            )
        cols = jnp.sum(
            a.reshape(-1, chunk, *a.shape[1:]), axis=1, dtype=U32
        )
        limbs, c = _carry(cols)
        c_lim = jnp.zeros(limbs.shape, U32)
        c_lim = c_lim.at[..., 0].set(c & MASK)
        c_lim = c_lim.at[..., 1].set((c >> LIMB_BITS) & MASK)
        hi_mod = mont_mul(spec, c_lim, jnp.asarray(spec.r2_arr))
        # lo mod p for any 16-limb lo (no < 2p assumption):
        # from_mont(to_mont(lo)) = lo mod p.
        lo = from_mont(spec, mont_mul(spec, limbs, jnp.asarray(spec.r2_arr)))
        a = add(spec, lo, hi_mod)
    return a[0]


def dot_mod(spec: FieldSpec, a, b, axis: int = 0):
    """Modular inner product <a, b> along `axis` (Montgomery inputs)."""
    return sum_mod(spec, mont_mul(spec, a, b), axis=axis)


def _jit1(fn):
    return jax.jit(fn, static_argnums=0)


batch_mont_mul = _jit1(mont_mul)
batch_add = _jit1(add)
batch_sub = _jit1(sub)
