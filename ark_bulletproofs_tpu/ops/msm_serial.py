"""Compile-light bit-serial MSM (device).

A correct but deliberately *minimal-graph* multi-scalar multiplication:
Horner over the 256 scalar bits, where each step masks the points whose
current bit is set, tree-reduces them, and folds into the accumulator
with one fused 2*acc+Q step. The whole program contains ~3 group-law
instantiations (the full Pippenger in ops/msm.py has ~10, each costing
~25 s of XLA compile on CPU), so this variant compiles in well under a
minute — it exists for the multi-chip dryrun and for mesh tests on the
virtual CPU device mesh, where compile time, not throughput, is the
binding constraint. Production MSMs use ops/msm.py.

Replaces the same reference primitive (`ark_ec::VariableBaseMSM::msm`,
reference src/inner_product_proof.rs:104) — bit-identical results, since
group addition is associative/commutative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import field as df
from .limbs import LIMB_BITS, N_LIMBS

U32 = jnp.uint32
SCALAR_BITS = 256


def _tree_reduce_width(spec, P, n: int):
    """Sum a (n, 16)-coord point array (n a power of two): fixed-width
    masked halving. One `add` instantiation regardless of n (the fori
    body is compiled once); O(n log n) lane work, fine for the tiny
    dryrun shapes."""
    assert n & (n - 1) == 0, "power-of-two width required"
    steps = max(n - 1, 0).bit_length()
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(k, x):
        half = jnp.int32(n) >> (k + 1)
        part = tuple(
            jnp.take(c, jnp.minimum(idx + half, n - 1), axis=0) for c in x
        )
        keep = jnp.broadcast_to(idx < half, (n,))
        return dc.select(keep, dc.add(spec, x, part), x)

    out = jax.lax.fori_loop(0, steps, body, P)
    return tuple(c[0] for c in out)


def msm_serial_impl(spec, X, Y, inf, scal, axis_name=None):
    """MSM via bit-serial Horner. X, Y: (n, 16) affine Montgomery limbs;
    inf: (n,) bool; scal: (n, 16) canonical scalar limbs. Returns one
    Jacobian point ((16,) coords). `axis_name` marks execution inside a
    shard_map body so replicated carry inits are pvary'd."""
    n = X.shape[0]
    one = df.mont_one(spec.fq, (n,))
    Z = jnp.where(inf[:, None], jnp.zeros_like(one), one)
    ident_n = dc.pvary_point(dc.point_zero(spec, (n,)), axis_name)

    def bit_body(acc, t):
        limb = jnp.take(scal, t // LIMB_BITS, axis=1)
        bit = (limb >> (t % LIMB_BITS).astype(U32)) & 1
        mask = bit > 0
        sel = dc.select(mask, (X, Y, Z), ident_n)
        tot = _tree_reduce_width(spec, sel, n)
        return dc.double_k_add(spec, acc, tot, 1), None

    ts = jnp.arange(SCALAR_BITS - 1, -1, -1, dtype=U32)
    init = dc.pvary_point(dc.point_zero(spec, ()), axis_name)
    acc, _ = jax.lax.scan(bit_body, init, ts)
    return acc


msm_serial_device = jax.jit(msm_serial_impl, static_argnums=(0,))
