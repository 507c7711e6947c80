"""Device (JAX) multi-scalar multiplication: TPU-native Pippenger.

Replaces the reference's `ark_ec::VariableBaseMSM::msm` (Pippenger over
rayon, reference call sites e.g. src/inner_product_proof.rs:104,124;
src/r1cs/prover.rs:516,532,546; src/r1cs/verifier.rs:574,685) with a
scatter-free formulation XLA can compile:

  for each window (lax.scan, one trace):
    1. digit extraction  — free: 16-bit limbs ARE the c=16 digits
       (8/4-bit windows are byte/nibble views)
    2. bucket grouping   — argsort by digit + gather (XLA sort), instead
       of the CPU's scatter-add into buckets
    3. bucket sums       — segmented `lax.associative_scan` with the
       Jacobian group law as combiner (~2n point adds, log-depth)
    4. segment-end scatter into a dense (2^c,) bucket table (`.at[].set`,
       one writer per bucket)
    5. sum_j j*B_j       — reverse associative_scan (suffix sums) + a
       pairwise halving tree reduction
  then a Horner pass over windows: acc = 2^c * acc + W_w (lax.scan).

All group math is the branch-free complete Jacobian law from ops/curve.py,
batched over (n,) lanes of 16x16-bit limbs.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import field as df
from .limbs import MASK, N_LIMBS, ints_to_limbs

U32 = jnp.uint32
SCALAR_BITS = 256


def _window_bits(n: int) -> int:
    """Adaptive Pippenger window size; must divide 16 (limb alignment).

    Balances bucket-accumulation work (~2n * 256/c adds) against bucket
    reduction work (~3 * 2^c * 256/c adds).
    """
    if n >= (1 << 17):
        return 16
    if n >= (1 << 11):
        return 8
    return 4


def _digits_for_window(scal, w, c: int):
    """(n,) digit of each scalar for window index w (traced)."""
    if c == 16:
        return jax.lax.dynamic_index_in_dim(scal, w, axis=1, keepdims=False)
    per = 16 // c
    limb = jax.lax.dynamic_index_in_dim(scal, w // per, axis=1, keepdims=False)
    shift = (w % per).astype(U32) * c
    return (limb >> shift) & jnp.uint32((1 << c) - 1)


def _segmented_bucket_sums(spec, pts, seg, n_buckets: int):
    """Bucket sums B_j for points sorted by segment id `seg`.

    Returns dense Jacobian buckets ((n_buckets, 16) x3); untouched buckets
    are the identity (Z = 0).
    """

    def combine(L, R):
        lp, lseg = L[:3], L[3]
        rp, rseg = R[:3], R[3]
        s = dc.add(spec, lp, rp)
        same = lseg == rseg
        return (
            df.select(same, s[0], rp[0]),
            df.select(same, s[1], rp[1]),
            df.select(same, s[2], rp[2]),
            rseg,
        )

    scanned = jax.lax.associative_scan(combine, (*pts, seg), axis=0)
    n = seg.shape[0]
    seg_next = jnp.concatenate([seg[1:], jnp.full((1,), 0xFFFFFFFF, U32)])
    is_end = seg != seg_next
    idx = jnp.where(is_end, seg, jnp.uint32(n_buckets))  # OOB rows dropped
    buckets = tuple(
        jnp.zeros((n_buckets, N_LIMBS), U32).at[idx].set(scanned[i])
        for i in range(3)
    )
    return buckets


def _weighted_bucket_reduce(spec, buckets, n_buckets: int):
    """sum_j j * B_j via suffix sums: S_j = sum_{k>=j} B_k; sum_{j>=1} S_j."""

    def combine(L, R):
        return dc.add(spec, L, R)

    rev = tuple(jnp.flip(b, axis=0) for b in buckets)
    suf = jax.lax.associative_scan(combine, rev, axis=0)
    S = tuple(jnp.flip(s, axis=0) for s in suf)
    # drop the weight-0 bucket: replace S_0 with the identity
    z = jnp.zeros((1, N_LIMBS), U32)
    S = tuple(jnp.concatenate([z, s[1:]], axis=0) for s in S)
    # pairwise halving tree reduction over the (power-of-two) bucket axis
    m = n_buckets
    while m > 1:
        half = m // 2
        S = dc.add(
            spec,
            tuple(s[:half] for s in S),
            tuple(s[half:m] for s in S),
        )
        m = half
    return tuple(s[0] for s in S)


def msm_impl(spec: dc.CurveSpec, c: int, X, Y, inf, scal):
    """Full Pippenger MSM on device (pure function, jit via msm_device).

    X, Y: (n, 16) affine Montgomery limbs; inf: (n,) bool; scal: (n, 16)
    canonical scalar limbs. Returns one Jacobian point ((16,) x3).
    """
    n = X.shape[0]
    n_windows = SCALAR_BITS // c
    n_buckets = 1 << c
    one = df.mont_one(spec.fq, (n,))
    Z = jnp.where(inf[..., None], jnp.zeros_like(one), one)

    def window_body(carry, w):
        digits = _digits_for_window(scal, w, c)
        order = jnp.argsort(digits)
        seg = digits[order]
        pts = (X[order], Y[order], Z[order])
        # zero-digit points must not enter their bucket's sum: they land in
        # bucket 0 which gets weight 0 in the reduction, so they're inert.
        buckets = _segmented_bucket_sums(spec, pts, seg, n_buckets)
        part = _weighted_bucket_reduce(spec, buckets, n_buckets)
        return carry, part

    ws = jnp.arange(n_windows, dtype=U32)
    _, partials = jax.lax.scan(window_body, 0, ws)

    # Horner over windows, top window first: acc = 2^c * acc + W_w
    def horner_body(acc, part):
        for _ in range(c):
            acc = dc.double(spec, acc)
        return dc.add(spec, acc, part), 0

    init = dc.point_zero(())
    rev = tuple(jnp.flip(p, axis=0) for p in partials)
    acc, _ = jax.lax.scan(horner_body, init, rev)
    return acc


msm_device = jax.jit(msm_impl, static_argnums=(0, 1))


# --- host-facing wrapper ------------------------------------------------


@lru_cache(maxsize=64)
def _pad_cache_key(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def msm(curve, bases: list, scalars: list[int]):
    """Host-facing device MSM: affine int points + int scalars -> affine.

    Pads to the next power of two with identity points so repeated
    protocol calls of similar size share one compiled program.
    """
    assert len(bases) == len(scalars)
    n = len(bases)
    if n == 0:
        return curve.zero()
    spec = dc.spec_for(curve)
    m = _pad_cache_key(n)
    fr_p = curve.fr.p
    ks = [s % fr_p for s in scalars] + [0] * (m - n)
    pts = list(bases) + [None] * (m - n)

    X, Y, inf = dc.affine_to_device(curve, pts)
    scal = ints_to_limbs(ks)
    c = _window_bits(m)
    out = msm_device(spec, c, X, Y, inf, scal)
    return dc.jacobian_to_host(curve, out)
