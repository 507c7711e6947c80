"""Device-accelerated generator sampling (BulletproofGens / GeneratorsChain).

The reference derives every generator with `G::rand(ChaCha(SHA3(label)))`
(reference src/generators.rs:78-121): per attempt, sample x via Fp::rand
(4 u64 limbs, mask, reject >= p), one u32 'greatest' bit, then a curve
sqrt — and retry until x lands on the curve. That is ~700 field muls per
generator of pure sequential CPU work in the reference.

TPU-native pipeline, bit-exact with arkworks 0.4 semantics:

  host   bulk ChaCha20 keystream (C++), framed 9 u32 words per attempt
         (the >= p rejection has probability ~2^-128 for these fields, so
         framing is fixed-width; any actual rejection falls back to the
         exact sequential host path)
  device batched to-Montgomery, rhs = x^3 + ax + b, batched branch-free
         Tonelli-Shanks sqrt (lax.scan square-and-multiply; the exponent
         arrives as a bit array so one compiled pow serves all fields)
  host   canonical roots out in bulk; pick the lexicographically larger /
         smaller root per the 'greatest' bit; assemble accepted points in
         stream order.

Attempt acceptance only reorders which attempt feeds which generator
index, never the randomness stream, so results equal the sequential path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import field as df
from .limbs import MASK, N_LIMBS, int_to_limbs, limbs_to_ints

U32 = jnp.uint32


def _bits_msb(e: int) -> np.ndarray:
    """MSB-first bit array TRIMMED to e's bit length (the square-and-
    multiply scan length is the array length — no wasted leading-zero
    iterations)."""
    width = max(e.bit_length(), 1)
    return np.array(
        [(e >> (width - 1 - i)) & 1 for i in range(width)], dtype=np.uint32
    )


@dataclass(frozen=True)
class SqrtSpec:
    """Per-field Tonelli-Shanks constants (hashable for jit).

    Stores bits of (q-1)/2 only: from w = a^((q-1)/2), ONE pow yields
    both Tonelli-Shanks seeds — r = w*a = a^((q+1)/2) and
    t = w*r = a^q — where the naive form pays two full 256-bit pows
    (measured 5.5 s/2^16-chunk on the v5e; the pow scan is the entire
    device cost of generator sampling)."""

    fq: df.FieldSpec
    s: int
    qm1h_bits: tuple  # (q-1)/2, MSB-first, trimmed
    c0_mont: tuple  # z^q * R mod p
    neg_one_mont: tuple  # (p-1) * R mod p

    @classmethod
    def create(cls, fq: df.FieldSpec) -> "SqrtSpec":
        p = fq.p
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        R = (1 << 256) % p
        return cls(
            fq=fq,
            s=s,
            qm1h_bits=tuple(int(b) for b in _bits_msb((q - 1) // 2)),
            c0_mont=tuple(int(v) for v in int_to_limbs(pow(z, q, p) * R % p)),
            neg_one_mont=tuple(int(v) for v in int_to_limbs((p - 1) * R % p)),
        )


_SQRT_SPECS: dict[str, SqrtSpec] = {}


def sqrt_spec_for(field) -> SqrtSpec:
    sp = _SQRT_SPECS.get(field.name)
    if sp is None:
        sp = SqrtSpec.create(df.spec_for(field))
        _SQRT_SPECS[field.name] = sp
    return sp


def pow_bits(spec: df.FieldSpec, x, bits):
    """x^e for Montgomery x (..., 16); bits (k,) MSB-first as data.

    Muls route through the Pallas CIOS kernel (df.mont_mul_fast,
    ~1 ns/mul vs ~250 ns for the XLA elementwise lowering at
    (..., 16)-minor layouts); CPU test runs fall back inside
    mont_mul_fast."""

    def body(acc, bit):
        acc = df.mont_mul_fast(spec, acc, acc)
        mul = df.mont_mul_fast(spec, acc, x)
        take = jnp.broadcast_to(bit > 0, acc.shape[:-1])
        return df.select(take, mul, acc), None

    acc0 = df.mont_one(spec, x.shape[:-1])
    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def batched_sqrt(sq: SqrtSpec, a):
    """Branch-free batched Tonelli-Shanks.

    a: (..., 16) Montgomery. Returns (root mont, is_square bool); for
    non-squares the root is garbage and is_square False. a == 0 yields
    (0, True).
    """
    f = sq.fq
    # Tail loop stays on the XLA mont_mul: it is O(s^2) ~ 15 muls per
    # attempt vs ~500 in the pow scan, and every extra mont_mul_fast
    # call site is another Pallas kernel instantiation in the program
    # (measured: all-Pallas compiled in 234 s vs scan-only ~2 sites).
    w = pow_bits(f, a, jnp.asarray(np.array(sq.qm1h_bits, dtype=np.uint32)))
    r = df.mont_mul(f, w, a)  # a^((q+1)/2)
    t = df.mont_mul(f, w, r)  # a^q
    c = jnp.broadcast_to(
        jnp.asarray(np.array(sq.c0_mont, dtype=np.uint32)), a.shape
    )
    neg1 = jnp.asarray(np.array(sq.neg_one_mont, dtype=np.uint32))
    for i in range(sq.s - 1, 0, -1):
        d = t
        d = jax.lax.fori_loop(0, i - 1, lambda _, x: df.mont_sqr(f, x), d)
        cond = df.eq(d, jnp.broadcast_to(neg1, d.shape))
        r = df.select(cond, df.mont_mul(f, r, c), r)
        c = df.mont_sqr(f, c)
        t = df.select(cond, df.mont_mul(f, t, c), t)
    ok = df.eq(df.mont_sqr(f, r), a)
    return r, ok


@partial(jax.jit, static_argnums=(0, 1))
def _candidate_roots(cspec: dc.CurveSpec, sq: SqrtSpec, x_raw):
    """x_raw (m, 16) sampled limbs -> (y canonical, ok, x canonical).

    arkworks `Fp::rand` interprets the accepted limbs as the MONTGOMERY
    representation (field value = raw * R^-1 mod p, see
    ark_bulletproofs_tpu/fields.py Field.rand), so x_raw IS Montgomery
    form already. Computes rhs = x^3 + ax + b and its batched sqrt;
    returns canonical limb arrays for bulk host conversion.
    """
    f = cspec.fq
    x = x_raw
    xx = df.mont_sqr(f, x)
    rhs = df.mont_mul(f, xx, x)
    if not cspec.is_a_zero:
        ax = df.mont_mul(f, jnp.asarray(cspec.a_mont_arr), x)
        rhs = df.add(f, rhs, ax)
    rhs = df.add(f, rhs, jnp.broadcast_to(jnp.asarray(cspec.b_mont_arr), rhs.shape))
    root, ok = batched_sqrt(sq, rhs)
    y = df.from_mont(f, root)
    xc = df.from_mont(f, x)
    return y, ok, xc


def candidate_points(curve, x_raw_ints: list[int], greatest: list[bool]):
    """Evaluate a batch of sampling attempts: list of (point | None).

    x_raw_ints are accepted Fp::rand raw limb values (= Montgomery form
    of the field element) in stream order; greatest the per-attempt sign
    bits. None marks x not on the curve. Bit-exact with
    fq.rand + SWCurve.get_point_from_x (host model).
    """
    from .limbs import ints_to_limbs

    cspec = dc.spec_for(curve)
    sq = sqrt_spec_for(curve.fq)
    x_raw = ints_to_limbs(x_raw_ints)
    y_l, ok, xc_l = _candidate_roots(cspec, sq, x_raw)
    ys = limbs_to_ints(np.asarray(y_l))
    xs = limbs_to_ints(np.asarray(xc_l))
    oks = np.asarray(ok)
    p = curve.fq.p
    out = []
    for x, y, good, g in zip(xs, ys, oks, greatest):
        if not good:
            out.append(None)
            continue
        ny = (p - y) % p
        lo, hi = (y, ny) if y <= ny else (ny, y)
        out.append((x, hi if g else lo))
    return out
