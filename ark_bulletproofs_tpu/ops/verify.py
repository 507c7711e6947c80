"""Device pipeline for R1CS verification scalars.

The reference verifier assembles a (2n + ~20)-long scalar vector per
proof on the CPU (reference src/r1cs/verifier.rs:462-540): the IPA
s-vector, y^-i powers, and the g/h scalar formulas. All of that is
elementwise/log-structured field math — here it runs on device in
Montgomery form and feeds the mega-MSM directly, so no O(n) host big-int
work and no O(n) host<->device scalar conversions remain on the verify
path.

Log-structured vectors: both the s-vector
  s[i] = allinv * prod_k (bit_k(i) ? u_sq[lg_n-1-k] : 1)
(reference src/inner_product_proof.rs:302-311) and the power vector
y^-i decompose over the bits of i, so each is lg(n) masked Montgomery
multiplies via lax.scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import field as df
from .limbs import N_LIMBS, ints_to_limbs

U32 = jnp.uint32


def _pow_vector(fr, base, n: int, lg_n: int):
    """[base^0, base^1, ..., base^(n-1)] in Montgomery form, (n, 16)."""
    idx = jnp.arange(n, dtype=U32)

    def sq_body(b, _):
        return df.mont_sqr(fr, b), b

    _, pows = jax.lax.scan(sq_body, base, None, length=lg_n)  # base^(2^k)

    def mul_body(v, inp):
        k, pw = inp
        mask = ((idx >> k) & 1) > 0
        factor = df.select(mask, jnp.broadcast_to(pw, v.shape),
                           df.mont_one(fr, (n,)))
        return df.mont_mul(fr, v, factor), None

    v0 = df.mont_one(fr, (n,))
    ks = jnp.arange(lg_n, dtype=U32)
    v, _ = jax.lax.scan(mul_body, v0, (ks, pows))
    return v


def _s_vector(fr, u_sq, allinv, n: int, lg_n: int):
    """IPA s-vector (n, 16) Montgomery; u_sq: (lg_n, 16) Montgomery."""
    idx = jnp.arange(n, dtype=U32)

    def body(v, inp):
        k, usq = inp
        mask = ((idx >> k) & 1) > 0
        factor = df.select(mask, jnp.broadcast_to(usq, v.shape),
                           df.mont_one(fr, (n,)))
        return df.mont_mul(fr, v, factor), None

    v0 = jnp.broadcast_to(allinv, (n, N_LIMBS))
    ks = jnp.arange(lg_n, dtype=U32)
    # bit k of i selects u_sq[lg_n - 1 - k]
    v, _ = jax.lax.scan(body, v0, (ks, jnp.flip(u_sq, axis=0)))
    return v


def _gh_formulas(fr, padded_n: int, lg_n: int,
                 wLm, wRm, wOm, y_inv_m, u_m, x_m, a_m, b_m,
                 u_sq_m, allinv_m, n1):
    """g/h scalar formulas for ONE proof, all-Montgomery in and out.

    Shared by the single-proof jit (`_gh_scalars`) and the vmapped
    per-batch program (`_gh_scalars_batch_accum`). Returns Montgomery
    (g, h, yneg_wR) — yneg_wR so the single path can derive delta.
    """
    y_inv_vec = _pow_vector(fr, y_inv_m, padded_n, lg_n)
    s = _s_vector(fr, u_sq_m, allinv_m, padded_n, lg_n)

    yneg_wR = df.mont_mul(fr, wRm, y_inv_vec)

    idx = jnp.arange(padded_n, dtype=U32)
    u_or_1 = df.select(
        idx < n1,
        df.mont_one(fr, (padded_n,)),
        jnp.broadcast_to(u_m, (padded_n, N_LIMBS)),
    )

    # g = u_or_1 * (x * yneg_wR - a * s)
    x_ywr, a_s = (
        df.mont_mul(fr, jnp.stack([jnp.broadcast_to(x_m, yneg_wR.shape),
                                   jnp.broadcast_to(a_m, s.shape)]),
                    jnp.stack([yneg_wR, s]))
    )
    g = df.mont_mul(fr, u_or_1, df.sub(fr, x_ywr, a_s))

    # h = u_or_1 * (y_inv^i * (x*wL + wO - b*s_rev) - 1)
    srev = jnp.flip(s, axis=0)
    x_wL, b_srev = (
        df.mont_mul(fr, jnp.stack([jnp.broadcast_to(x_m, wLm.shape),
                                   jnp.broadcast_to(b_m, srev.shape)]),
                    jnp.stack([wLm, srev]))
    )
    inner = df.sub(fr, df.add(fr, x_wL, wOm), b_srev)
    h = df.mont_mul(
        fr, u_or_1,
        df.sub(fr, df.mont_mul(fr, y_inv_vec, inner),
               df.mont_one(fr, (padded_n,))),
    )
    return g, h, yneg_wR


@partial(jax.jit, static_argnums=(0, 1, 2, 14))
def _gh_scalars(fr, padded_n: int, lg_n: int,
                wL, wR, wO, y_inv, u, x, a, b, u_sq, allinv, n1,
                mont_out: bool = False):
    """Device g/h scalar vectors + delta for one proof.

    wL/wR/wO: (padded_n, 16) CANONICAL limbs (zero-padded); scalars
    y_inv/u/x/a/b/allinv: (16,) canonical; u_sq: (lg_n, 16) canonical.
    n1: dynamic phase-1 multiplier count.
    Returns (g, h) canonical (padded_n, 16) and delta (16,) canonical.
    """
    to_m = lambda v: df.to_mont(fr, v)
    g, h, yneg_wR = _gh_formulas(
        fr, padded_n, lg_n,
        to_m(wL), to_m(wR), to_m(wO),
        to_m(y_inv), to_m(u), to_m(x), to_m(a), to_m(b),
        to_m(u_sq), to_m(allinv), n1,
    )
    delta = df.dot_mod(fr, yneg_wR, df.to_mont(fr, wL))

    if mont_out:
        return g, h, df.from_mont(fr, delta)
    from_m = lambda v: df.from_mont(fr, v)
    return from_m(g), from_m(h), from_m(delta)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _gh_scalars_batch_accum(fr, padded_n: int, lg_n: int,
                            wL, wR, wO, y_inv, u, x, a, b,
                            u_sq, allinv, n1, alpha):
    """B proofs' g/h vectors, alpha-scaled and batch-summed: ONE dispatch.

    The reference batch-verifier accumulates each proof's g/h scalar
    vector (scaled by its random alpha) into shared generator columns
    (verifier.rs:655-664); doing that per proof costs 2 device dispatches
    x B proofs (~60 s of pure tunnel RPC at B=1024). The formulas are
    identical across proofs, so this vmaps the whole pipeline over the
    batch and tree-reduces on device.

    Shapes: wL/wR/wO (B, padded_n, 16) canonical; y_inv/u/x/a/b/allinv
    (B, 16) canonical; u_sq (B, lg_n, 16) canonical; n1 (B,) uint32;
    alpha (B, 16) MONTGOMERY. Returns (g_acc, h_acc) Montgomery
    (padded_n, 16): sum_b alpha_b * {g,h}_b.
    """
    to_m = lambda v: df.to_mont(fr, v)

    def one(args):
        wLc, wRc, wOc, yi, uu, xx, aa, bb, usq, ai, n1i, al = args
        g, h, _ = _gh_formulas(
            fr, padded_n, lg_n,
            to_m(wLc), to_m(wRc), to_m(wOc),
            to_m(yi), to_m(uu), to_m(xx), to_m(aa), to_m(bb),
            to_m(usq), to_m(ai), n1i,
        )
        gh = df.mont_mul(
            fr, jnp.stack([g, h]),
            jnp.broadcast_to(al, g.shape)[None],
        )
        return gh[0], gh[1]

    g_all, h_all = jax.vmap(one)(
        (wL, wR, wO, y_inv, u, x, a, b, u_sq, allinv, n1, alpha)
    )  # (B, padded_n, 16) Montgomery

    # tree-reduce over the batch axis (modular adds, lg B levels)
    B = g_all.shape[0]
    gh = jnp.stack([g_all, h_all])  # (2, B, n, 16)
    while B > 1:
        half = (B + 1) // 2
        lo = gh[:, :half]
        hi = gh[:, half:]
        pad = half - hi.shape[1]
        if pad:
            hi = jnp.pad(hi, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gh = df.add(fr, lo, hi)
        B = half
    return gh[0, 0], gh[1, 0]


def gh_scalars(curve, padded_n: int, wL, wR, wO,
               y_inv: int, u: int, x: int, a: int, b: int,
               u_sq: list[int], allinv: int, n1: int,
               mont_out: bool = False, delta_host: bool = False):
    """Host wrapper: int inputs -> device (g, h) limb arrays + delta int.

    g/h stay on device (returned as jax arrays, canonical unless
    mont_out) for direct MSM feeding; delta returns as a host int for
    the B-coefficient formula.

    `delta_host=True` computes delta = <y^-n ∘ wR, wL> (reference
    verifier.rs:473) with host ints instead of FETCHING the device
    value: `np.asarray(delta)` is a blocking device sync (one ~29 ms
    tunnel RPC — and in batch_verify it serializes the whole per-proof
    pipeline, 1024 blocking syncs per batch). The host dot is O(n)
    small-int mults (~0.2 us/term), cheaper than one sync up to
    n ~ 10^5.
    """
    from .limbs import limbs_to_int

    fr = df.spec_for(curve.fr)
    lg_n = padded_n.bit_length() - 1
    assert len(u_sq) == lg_n

    # Mesh-sharded scalar pipeline for LARGE single proofs (SURVEY.md
    # §5 sharded length-n): the g/h math is elementwise over padded_n,
    # so annotating the w-vector inputs lets GSPMD split it; small
    # batch-verify proofs stay replicated (sharding 16-row vectors over
    # a mesh costs more in collectives than it saves).
    from .. import engine as _engine

    mesh = _engine.active_mesh()
    shard = (
        mesh is not None
        and mesh.devices.size > 1
        and padded_n >= 4096
        and padded_n % mesh.devices.size == 0
    )
    if shard:
        from ..parallel.mesh import data_sharding

        sh = data_sharding(mesh)

    def vec(v):
        arr = ints_to_limbs(list(v) + [0] * (padded_n - len(v)))
        return jax.device_put(arr, sh) if shard else arr

    def one(v):
        return ints_to_limbs([v])[0]

    g, h, delta = _gh_scalars(
        fr, padded_n, lg_n,
        vec(wL), vec(wR), vec(wO),
        one(y_inv), one(u), one(x), one(a), one(b),
        ints_to_limbs(list(u_sq)) if u_sq else np.zeros((0, 16), np.uint32),
        one(allinv), jnp.uint32(n1), mont_out,
    )
    if delta_host:
        return g, h, compute_delta_host(curve.fr.p, wL, wR, y_inv)
    return g, h, limbs_to_int(np.asarray(delta))


def compute_delta_host(p: int, wL, wR, y_inv: int) -> int:
    """delta = <y^-n ∘ wR, wL> with host ints (reference verifier.rs:473).

    Fetching the device delta is a blocking sync (~29 ms tunnel RPC); the
    host dot is O(n) small-int mults, cheaper than one sync to n ~ 10^5.
    """
    acc, yi = 0, 1
    for wRi, wLi in zip(wR, wL):
        acc = (acc + wRi * yi % p * wLi) % p
        yi = yi * y_inv % p
    return acc


@partial(jax.jit, static_argnums=(0,))
def _scale_accumulate(fr, acc_g, acc_h, g, h, alpha):
    """(acc_g + alpha*g, acc_h + alpha*h), all Montgomery (m, 16)."""
    ab = df.mont_mul(
        fr,
        jnp.stack([g, h]),
        jnp.broadcast_to(alpha, g.shape)[None],
    )
    return df.add(fr, acc_g, ab[0]), df.add(fr, acc_h, ab[1])


# --- standalone IPA verification (device big-MSM path) ------------------
#
# `InnerProductProof.verify` (ipp.py; reference
# src/inner_product_proof.rs:321-382) previously assembled its whole
# (2n + 2 lg n + 1)-term MSM on the host: O(n) big-int scalar math plus
# a fresh marshal + upload of the 2n generator points and 2n scalars per
# call — ~3 s of a 3.3 s n=2^16 verify through the tunnel (the MSM
# itself measures 63 ms). Here the generator table AND the factor
# vectors are cached on device across calls, the s-vector and g/h
# scalars are computed on-chip from the lg n challenges, and only the
# tiny [Q | L | R] tail (2 lg n + 1 points) runs on the host's native
# Pippenger.

_IPA_VERIFY_CACHE: dict = {}


def _cached_mont_vector(fr, key, xs, p, R):
    hit = _IPA_VERIFY_CACHE.get(key)
    if hit is None:
        hit = jax.device_put(ints_to_limbs([x % p * R % p for x in xs]))
        _IPA_VERIFY_CACHE[key] = hit
    return hit


def ipa_gh_msm(curve, n: int, a: int, b: int, u_sq, allinv,
               G_factors, H_factors, G_vec, H_vec):
    """<a * s * Gf, G> + <b * rev(s) * Hf, H> on device -> host affine.

    Caches the [G | H] device table and the Montgomery factor vectors
    keyed on (curve, n, endpoint values) — generator tables and factor
    vectors are deterministic artifacts, so endpoint equality pins them
    in practice while letting fresh lists hit the cache.
    """
    from . import curve as dc
    from ..parallel.msm import msm_device_maybe_sharded
    from . import msm as dmsm

    fr = df.spec_for(curve.fr)
    p, R = curve.fr.p, curve.fr.R
    lg_n = n.bit_length() - 1

    tkey = ("table", curve.name, n, G_vec[0], G_vec[-1], H_vec[0], H_vec[-1])
    table = _IPA_VERIFY_CACHE.get(tkey)
    if table is None:
        X, Y, inf = dc.affine_to_device(curve, list(G_vec) + list(H_vec))
        table = (
            jax.device_put(X), jax.device_put(Y),
            jax.device_put(np.asarray(inf)),
        )
        _IPA_VERIFY_CACHE[tkey] = table
    X, Y, inf = table

    gf = _cached_mont_vector(
        fr, ("gf", curve.name, n, G_factors[0], G_factors[-1]),
        G_factors, p, R,
    )
    hf = _cached_mont_vector(
        fr, ("hf", curve.name, n, H_factors[0], H_factors[-1]),
        H_factors, p, R,
    )

    u_sq_m = ints_to_limbs([u * R % p for u in u_sq])
    out = _ipa_gh_msm_dev(
        fr, dc.spec_for(curve), dmsm._window_bits(2 * n), n, lg_n,
        X, Y, inf, gf, hf,
        jnp.asarray(u_sq_m),
        jnp.asarray(ints_to_limbs([allinv * R % p])[0]),
        jnp.asarray(ints_to_limbs([a % p * R % p])[0]),
        jnp.asarray(ints_to_limbs([b % p * R % p])[0]),
    )
    return dc.point_to_host(curve, out)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _ipa_gh_msm_dev(fr, spec, c: int, n: int, lg_n: int,
                    X, Y, inf, gf, hf, u_sq_m, allinv_m, a_m, b_m):
    from . import msm2
    from . import msm as dmsm
    from . import proj as dpj

    s = _s_vector(fr, u_sq_m, allinv_m, n, lg_n)
    g = df.mont_mul(fr, df.mont_mul(fr, s, gf),
                    jnp.broadcast_to(a_m, s.shape))
    h = df.mont_mul(fr, df.mont_mul(fr, jnp.flip(s, axis=0), hf),
                    jnp.broadcast_to(b_m, s.shape))
    scal = df.from_mont_fast(fr, jnp.concatenate([g, h], axis=0))
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and 2 * n >= 1024:
        # one fused v2 program (measured 58.8 ms at 2^17 — beats the
        # host-chained staged pipeline for this in-jit single set)
        return dpj.to_jacobian(
            spec, msm2.msm2_impl(spec, msm2.window_bits(2 * n),
                                 X, Y, inf, scal)
        )
    return dmsm.msm_impl(spec, c, X, Y, inf, scal)
