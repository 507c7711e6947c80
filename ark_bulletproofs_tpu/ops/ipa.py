"""Device-resident inner-product-argument prover state.

The reference's IPA (src/inner_product_proof.rs:76-231) folds generator
vectors every round with per-element 2-point MSMs. The TPU design keeps
ALL O(n) state on device across rounds — witness halves a/b, and
per-original-index fold weights g_mult/h_mult over the FIXED base table
[G | H | Q] — so each round is:

  device:  weight vectors + c_L/c_R (masked elementwise mont ops),
           one batched 2-row MSM over the padded base table (L and R
           vmapped together, ops/msm.py)
  host:    transcript append L/R, squeeze challenge u (Fiat-Shamir is a
           sequential host chain by construction)
  device:  fold a, b and update the weights (elementwise, masked)

Every device function has FIXED shapes (N, M = padded 2N+1) with the
round size `m` passed as a dynamic operand, so the whole proof reuses
two compiled programs regardless of lg(N) rounds.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import field as df
from . import msm as dmsm
from .limbs import N_LIMBS, ints_to_limbs

U32 = jnp.uint32


@partial(jax.jit, static_argnums=(0, 7))
def _round_scalars(fr: df.FieldSpec, a, b, gm, hm, m, curm1, M: int):
    """Build the two MSM scalar rows + (c_L, c_R) for one IPA round.

    a, b, gm, hm: (N, 16) Montgomery. m: current half size (dynamic).
    curm1: cur - 1 (dynamic; cur is a power of two so & curm1 is mod cur).
    Returns (scal2 (2, M, 16) canonical) where row 0 = L scalars
    [gw_L | hw_L | c_L | 0...], row 1 = R scalars. Shared body with the
    batched path (`_round_scalars_mont`); the single-proof Q column
    carries factor one.
    """
    one = df.mont_one(fr, ())
    return _round_scalars_mont(fr, a, b, gm, hm, one, m, curm1, M)


def _fold_math(fr: df.FieldSpec, a, b, gm, hm, u, u_inv, a_up, b_up,
               right, active):
    """Shared fold body: callers supply the half-shift gathers + masks."""
    u_sel_g = df.select(right, jnp.broadcast_to(u, gm.shape),
                        jnp.broadcast_to(u_inv, gm.shape))
    u_sel_h = df.select(right, jnp.broadcast_to(u_inv, hm.shape),
                        jnp.broadcast_to(u, hm.shape))
    prods = df.mont_mul_fast(
        fr,
        jnp.stack([a, a_up, b, b_up, gm, hm]),
        jnp.stack(
            [
                jnp.broadcast_to(u, a.shape),
                jnp.broadcast_to(u_inv, a.shape),
                jnp.broadcast_to(u_inv, b.shape),
                jnp.broadcast_to(u, b.shape),
                u_sel_g,
                u_sel_h,
            ]
        ),
    )
    zero = jnp.zeros_like(a)
    a_new = df.select(active, df.add(fr, prods[0], prods[1]), zero)
    b_new = df.select(active, df.add(fr, prods[2], prods[3]), zero)
    return a_new, b_new, prods[4], prods[5]


@partial(jax.jit, static_argnums=(0,))
def _fold(fr: df.FieldSpec, a, b, gm, hm, u, u_inv, m, curm1):
    """Fold witness halves and update base weights after challenge u."""
    N = a.shape[0]
    idx = jnp.arange(N, dtype=U32)
    i = idx & curm1
    right = i >= m
    active = idx < m

    a_up = jnp.take(a, (idx + m).astype(jnp.int32), axis=0, mode="clip")
    b_up = jnp.take(b, (idx + m).astype(jnp.int32), axis=0, mode="clip")
    return _fold_math(fr, a, b, gm, hm, u, u_inv, a_up, b_up, right, active)


# --- mesh-sharded vector phase (SURVEY.md §5 "sharded length-n") --------
#
# When an engine mesh is active, the O(n) witness/weight vectors are
# themselves sharded across devices (not just the MSM base table). The
# prover drives rounds from the host, so `cur` is a Python int: the
# half-shift gathers become STATIC slice/tile ops and the masks become
# compile-time constants, which lets GSPMD partition everything itself —
# the a[i±m] shifts lower to collective-permutes / an O(m) prefix
# all-gather, and the c_L/c_R inner products become psum-reduced per-
# device partials. One compile per round size (lg n field-only graphs)
# instead of the single dynamic-shape program used on one chip.


def _masks_static(N: int, cur: int):
    idx = np.arange(N, dtype=np.uint32)
    right = (idx & (cur - 1)) >= (cur // 2)
    active = idx < (cur // 2)
    return jnp.asarray(right), jnp.asarray(active)


@partial(jax.jit, static_argnums=(0, 6, 7))
def _round_scalars_sharded(fr: df.FieldSpec, a, b, gm, hm, qw,
                           cur: int, M: int):
    """`_round_scalars` with static `cur`; structural periodic gathers.

    a_up[idx] = a[(idx mod cur) + m] (valid on the left half of each
    period) reads the global [m, cur) prefix; a_dn[idx] = a[(idx mod
    cur) - m] (valid on the right half) reads the global [0, m) prefix —
    both expressed as tile(concat(...)) so the operand slices are
    static and GSPMD only moves the O(cur) live prefix.
    """
    N = a.shape[0]
    m = cur // 2
    right, active = _masks_static(N, cur)
    reps = N // cur
    zero_blk = jnp.zeros((m, N_LIMBS), U32)

    def up(x):  # x[(idx mod cur) + m], left halves
        return jnp.tile(
            jnp.concatenate([x[m:cur], zero_blk], axis=0), (reps, 1)
        )

    def dn(x):  # x[(idx mod cur) - m], right halves
        return jnp.tile(
            jnp.concatenate([zero_blk, x[:m]], axis=0), (reps, 1)
        )

    return _rows_math(fr, a, b, gm, hm, qw, up(a), up(b), dn(a), dn(b),
                      right, active, M)


@partial(jax.jit, static_argnums=(0, 7))
def _fold_sharded(fr: df.FieldSpec, a, b, gm, hm, u, u_inv, cur: int):
    """`_fold` with static `cur`: the a[idx+m] shift is a static slice
    (GSPMD: collective-permute), masks are constants."""
    N = a.shape[0]
    m = cur // 2
    right, active = _masks_static(N, cur)
    zero_blk = jnp.zeros((m, N_LIMBS), U32)
    a_up = jnp.concatenate([a[m:], zero_blk], axis=0)
    b_up = jnp.concatenate([b[m:], zero_blk], axis=0)
    return _fold_math(fr, a, b, gm, hm, u, u_inv, a_up, b_up,
                      right, active)


# L and R ride the batched-scalar-set mode of msm_impl: one program,
# same graph size as a single MSM, 2x the window groups. When an engine
# mesh is active the base-table axis shards across it (per-round L/R
# partial points are the only cross-chip traffic, SURVEY.md §5).
def _msm_pair(spec, c, X, Y, inf, scal, base_map=None):
    from ..parallel.msm import msm_device_maybe_sharded

    return msm_device_maybe_sharded(spec, c, X, Y, inf, scal, base_map)


# --- compact rounds ------------------------------------------------------
#
# The full-width round rows ([gw | hw | c*qw | pad], ops above) carry 2N+1
# scalars padded to 4N, but the gw/hw masks are COMPLEMENTARY: for every
# original index i exactly one of (G_i, H_i) has a nonzero scalar in each
# row (gw_L lives where (i mod cur) >= m, hw_L on the other half, and
# vice versa for R). So each round is really an N-term MSM over a per-
# round CHOICE of G_i-or-H_i — expressed below as an N-wide scalar row
# plus a base_map indirection into the fixed [G | H] table (composed
# into the MSM's sort-order gather, ops/msm2.py::_stage_gather — no
# gathered tables are materialized). The Q term (c_L * qw) leaves the
# MSM entirely: it is fetched with the L/R partials in the SAME device
# sync the Fiat-Shamir chain already requires and added on host via the
# native fixed-base path. 4x fewer MSM terms per round, bit-identical
# proofs. Reference shape: src/inner_product_proof.rs:96-135.


@partial(jax.jit, static_argnums=(0,))
def _round_scalars_compact(fr: df.FieldSpec, a, b, gm, hm, qw, m, curm1):
    """One round's compact MSM inputs: (rows (2, N, 16) canonical,
    base_map (2, N) int32 into [G | H], cq (2, 16) canonical Q scalars).
    """
    N = a.shape[0]
    idx = jnp.arange(N, dtype=U32)
    i = idx & curm1
    right = i >= m
    active = idx < m

    up_idx = (i + m).astype(jnp.int32)
    a_up = jnp.take(a, up_idx, axis=0, mode="clip")
    b_up = jnp.take(b, up_idx, axis=0, mode="clip")
    dn_idx = jnp.maximum(i.astype(jnp.int32) - m.astype(jnp.int32), 0)
    a_dn = jnp.take(a, dn_idx, axis=0, mode="clip")
    b_dn = jnp.take(b, dn_idx, axis=0, mode="clip")

    prods = df.mont_mul_fast(
        fr,
        jnp.stack([a_dn, b_up, a_up, b_dn, a, a_up]),
        jnp.stack([gm, hm, gm, hm, b_up, b]),
    )
    # row_L: gw_L = a_dn*gm on right-half slots (base G_i), hw_L = b_up*hm
    # on left-half slots (base H_i) — exactly one per index. row_R is the
    # complement.
    row_L = df.select(right, prods[0], prods[1])
    row_R = df.select(right, prods[3], prods[2])
    iN = idx.astype(jnp.int32)
    bm_L = jnp.where(right, iN, iN + N)
    bm_R = jnp.where(right, iN + N, iN)

    zero = jnp.zeros_like(a)
    c_L = df.sum_mod(fr, df.select(active, prods[4], zero))
    c_R = df.sum_mod(fr, df.select(active, prods[5], zero))
    c_LR = df.mont_mul(fr, jnp.stack([c_L, c_R]), jnp.stack([qw, qw]))

    rows = df.from_mont_fast(fr, jnp.stack([row_L, row_R]))
    cq = df.from_mont(fr, c_LR)
    return rows, jnp.stack([bm_L, bm_R]), cq


# --- table shrink (segmented base fold) ---------------------------------
#
# The weighted-fold design keeps rounds at FULL width N: after r rounds
# the live witness is cur = N/2^r wide but the fold weights gm/hm still
# span all N original indices, so every round's MSM is N terms. Once
# T = N/cur segments share each live slot, the virtual folded generator
#
#   G'_j = sum_{t<T} gm[j + t*cur] * G[j + t*cur]      (j < cur)
#
# is worth MATERIALIZING: one batched base_map MSM (2*cur sets of T
# terms each — exactly one round's worth of MSM work) rebuilds the
# table at width cur, the weights reset to one, and every remaining
# round runs cur-term MSMs instead of N-term ones. Group math is exact,
# so L/R (and the proof bytes) are unchanged. Reference anchor: this
# recovers the reference's physical fold (inner_product_proof.rs:
# 143-155, 219-225) but only once per 7+ rounds and as one batched MSM
# instead of n two-point MSMs. Threshold: ABTPU_IPA_SHRINK_T (segments
# per slot; default 128 = the batched v2 kernel's minimum profitable
# set width; 0 disables).


def _shrink_threshold() -> int:
    import os

    return int(os.environ.get("ABTPU_IPA_SHRINK_T", "128"))


def _cq_ints(curve, rows) -> list[int]:
    """Host (K, 16) canonical Fr limb rows -> K ints."""
    from .limbs import limbs_to_int

    return [limbs_to_int(rows[k]) % curve.fr.p for k in range(rows.shape[0])]


def _host_q_jacs(curve, Q, values: list[int]) -> list:
    """[v * Q] as host Jacobian int tuples, via the native fixed-base
    window tables when available (the per-base table build is cached in
    the C++ layer, so lg-n rounds against one Q cost ~us each after the
    first). Fallback: the exact host double-and-add."""
    from .. import native

    if (
        len(values) >= 2
        and getattr(curve, "b", None) is not None
        and native.set_curve_native(curve)
    ):
        jacs = native.commit_many_native(
            Q, Q, values, [0] * len(values), curve.fr.p
        )
        if jacs is not None:
            return jacs
    return [curve.to_proj(curve.mul(Q, v)) for v in values]


# One fused program per round (single-proof prover): [pending fold] ->
# compact round scalars -> v2 MSM -> Jacobian -> one (8, 16) fetch
# block. Through the tunneled TPU every dispatch is a ~27.5 ms RPC;
# chaining the round's five phases from the host costs more in RPCs
# than the device math (measured 5.2 s vs ~2.7 s of device time at
# n = 2^16) — fusing them makes a round exactly one dispatch + the one
# blocking fetch the Fiat-Shamir chain forces anyway.
@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_step(spec, fr: df.FieldSpec, c: int, do_fold: bool,
                X, Y, inf, a, b, gm, hm, one_q,
                u, u_inv, fold_m, fold_curm1, m, curm1):
    from . import msm2
    from . import proj as dpj

    if do_fold:
        a, b, gm, hm = _fold.__wrapped__(
            fr, a, b, gm, hm, u, u_inv, fold_m, fold_curm1
        )
    rows, bm, cq = _round_scalars_compact.__wrapped__(
        fr, a, b, gm, hm, one_q, m, curm1
    )
    pts = dpj.to_jacobian(
        spec, msm2.msm2_impl(spec, c, X, Y, inf, rows, bm)
    )
    nc = len(pts)  # 3 SW Jacobian / 4 TE extended coords
    fetch = jnp.concatenate(
        [jnp.stack(pts).reshape(2 * nc, N_LIMBS), cq], axis=0
    )
    return a, b, gm, hm, fetch


@partial(jax.jit, static_argnums=(0,))
def _round_scalars_compact_batch(fr: df.FieldSpec, A, Bv, GM, HM, QW,
                                 m, curm1):
    """Vmapped compact rounds for P lockstep proofs: (rows (P, 2, N, 16),
    base_map (2, N) — shared, cur is common across the batch —
    cq (P, 2, 16))."""

    def one(a, b, gm, hm, qw):
        rows, _, cq = _round_scalars_compact.__wrapped__(
            fr, a, b, gm, hm, qw, m, curm1
        )
        return rows, cq

    rows, cq = jax.vmap(one)(A, Bv, GM, HM, QW)
    N = A.shape[1]
    idx = jnp.arange(N, dtype=U32)
    right = (idx & curm1) >= m
    iN = idx.astype(jnp.int32)
    bm = jnp.stack(
        [jnp.where(right, iN, iN + N), jnp.where(right, iN + N, iN)]
    )
    return rows, bm, cq


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_step_batch(spec, fr: df.FieldSpec, c: int, do_fold: bool,
                      X, Y, inf, A, Bv, GM, HM, QW,
                      U, Ui, fold_m, fold_curm1, m, curm1):
    """Fused one-dispatch round for the P-proof lockstep prover (see
    _round_step): [pending vmapped fold] -> batched compact scalars ->
    one batched v2 MSM -> (8P, 16) fetch block."""
    from . import msm2
    from . import proj as dpj

    if do_fold:
        A, Bv, GM, HM = _fold_batch.__wrapped__(
            fr, A, Bv, GM, HM, U, Ui, fold_m, fold_curm1
        )
    rows, bm, cq = _round_scalars_compact_batch.__wrapped__(
        fr, A, Bv, GM, HM, QW, m, curm1
    )
    P, _, N, _ = rows.shape
    scal = rows.reshape(2 * P, N, N_LIMBS)
    bm_full = jnp.tile(bm, (P, 1))
    pts = dpj.to_jacobian(
        spec, msm2.msm2_impl(spec, c, X, Y, inf, scal, bm_full)
    )
    nc = len(pts)  # 3 SW Jacobian / 4 TE extended coords
    fetch = jnp.concatenate(
        [
            jnp.stack(pts).reshape(2 * nc * P, N_LIMBS),
            cq.reshape(2 * P, N_LIMBS),
        ],
        axis=0,
    )
    return A, Bv, GM, HM, fetch


# --- fully device-resident prover (on-chip Fiat-Shamir) -----------------
#
# The per-round design above still syncs with the host once per round:
# the Merlin transcript lives on the host, so every challenge is a
# blocking fetch (2 tunnel RPCs x lg n rounds dominated the measured
# k=1024 shuffle prove). With the byte layer on device (ops/fs.py) the
# ENTIRE round loop — compact-round MSM, Q term, to-affine, arkworks
# serialization, transcript absorb, challenge squeeze, ChaCha Fp::rand,
# field inversion, fold — is ONE fori_loop program: a single dispatch
# and a single fetch for the whole IPA. The host then replays the
# transcript appends (cheap native Keccak) and asserts byte-identical
# state, which both keeps the live host transcript in sync for the
# rest of the protocol and catches the ~2^-128 Fp::rand rejection case
# (the device cannot redraw in-program; the caller falls back to the
# per-round path). Reference: src/inner_product_proof.rs:164-231.


def _q_doubles(spec, qx, qy):
    """(256, 16) xNC model coords of 2^i * Q — computed ONCE per proof
    (a 256-step scan) so every round's k*Q becomes a masked 8-step tree
    reduction instead of its own 256-step double-and-add (TPU loop
    iterations cost ~100 us each; the scan was 35 ms/round). NC = 3
    SW Jacobian / 4 TE extended."""
    if dc.is_te(spec):
        t = df.mont_mul(spec.fq, qx, qy)
        qj = (qx[None], qy[None], t[None], df.mont_one(spec.fq, (1,)))
    else:
        qj = (qx[None], qy[None], df.mont_one(spec.fq, (1,)))

    def step(P, _):
        return dc.double(spec, P), tuple(c[0] for c in P)

    _, pows = jax.lax.scan(step, qj, None, length=256)
    return pows  # tuple of NC arrays (256, 16)


def _mul_point_dev(spec, p2, k):
    """k * Q for canonical scalars k (B, 16) from the 2^i*Q table `p2`:
    per-bit masked select + unrolled binary tree reduction (8 vector
    adds, ZERO loop iterations)."""
    B = k.shape[0]
    bits_idx = np.arange(256)
    limb_idx = bits_idx // 16
    shift = jnp.asarray((bits_idx % 16).astype(np.uint32))
    bits = (k[:, limb_idx] >> shift) & 1  # (B, 256)
    zero = dc.point_zero(spec, (B, 256))
    pt = tuple(jnp.broadcast_to(c, (B, 256, N_LIMBS)) for c in p2)
    acc = dc.select(bits > 0, pt, zero)
    # unrolled masked halving: static halves make the shifted operand a
    # STATIC slice (a traced jnp.take along axis 1 lowers to per-element
    # gathers at ~6 ns each — ~50 ms/round at the batch prover's 2P=256
    # sets); 8 add instantiations instead of one fori body
    idx = jnp.arange(256, dtype=jnp.int32)
    for s in range(8):
        half = 256 >> (s + 1)
        part = tuple(
            jnp.concatenate(
                [c[:, half:], jnp.zeros_like(c[:, :half])], axis=1
            )
            for c in acc
        )
        keep = jnp.broadcast_to(idx < half, (B, 256))
        acc = dc.select(keep, dc.add(spec, acc, part), acc)
    return tuple(c[:, 0] for c in acc)


_q_doubles_jit = jax.jit(_q_doubles, static_argnums=(0,))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _shrink_fs_chunk(spec, fr: df.FieldSpec, T: int, X, Y, inf,
                     wts, bm):
    """One set-slice of the segmented shrink: (B_c, T) Montgomery fold
    weights + (B_c, T) base_map -> (B_c, 16) affine coords + inf."""
    from . import fs
    from . import msm2

    fq = spec.fq
    scal = df.from_mont_fast(fr, wts)  # (B_c, T) canonical
    c = msm2.window_bits(T)
    out = msm2.msm2_impl(spec, c, X, Y, inf, scal, bm)  # model-native
    if dc.is_te(spec):
        z = out[3]
    else:  # RCB projective (X : Y : Z), affine = (X/Z, Y/Z)
        z = out[2]
    zi = fs.mont_pow_pm2.__wrapped__(fq, z)
    x_a = df.mont_mul(fq, out[0], zi)
    y_a = df.mont_mul(fq, out[1], zi)
    inf2 = df.is_zero(z)
    zero = jnp.zeros_like(x_a)
    return (
        df.select(inf2, zero, x_a),
        df.select(inf2, zero, y_a),
        inf2,
    )


def _shrink_fs_dev(spec, fr: df.FieldSpec, T: int, X, Y, inf, gm, hm):
    """On-device segmented table shrink for the FS prover.

    After r = lg(T) rounds the live witness is cur = N/T wide but the
    fold weights still span all N original indices; materialize the
    virtual folded generators G'_j = sum_t gm[j + t*cur] * G[j + t*cur]
    (and H') as batched base_map v2 MSMs (2*cur sets of T terms) + a
    vmapped unrolled-pow batch inversion — all device-resident and
    async, so chaining segments costs zero host syncs. The set axis is
    CHUNKED (ABTPU_IPA_SHRINK_SETS, default 2048): one fused dispatch
    over all 2*cur sets scales its (B*W, S, 16)-limb bucket temps past
    HBM (measured OOM at 16.03/15.75 GB for 8192 sets at N=2^16).
    Recovers the reference's physical per-round fold
    (inner_product_proof.rs:143-155, 219-225) once per segment instead
    of every round. Returns the folded (2*cur, 16) table."""
    N = gm.shape[0]
    cur = N // T
    gm_r = jnp.transpose(gm.reshape(T, cur, N_LIMBS), (1, 0, 2))
    hm_r = jnp.transpose(hm.reshape(T, cur, N_LIMBS), (1, 0, 2))
    wts = jnp.concatenate([gm_r, hm_r], axis=0)  # (2*cur, T) Montgomery
    base = (
        jnp.arange(cur, dtype=jnp.int32)[:, None]
        + jnp.arange(T, dtype=jnp.int32)[None, :] * cur
    )
    bm = jnp.concatenate([base, base + N], axis=0)  # (2*cur, T)
    cap = int(os.environ.get("ABTPU_IPA_SHRINK_SETS", "2048"))
    parts = [
        _shrink_fs_chunk(spec, fr, T, X, Y, inf,
                         wts[s:s + cap], bm[s:s + cap])
        for s in range(0, 2 * cur, cap)
    ]
    if len(parts) == 1:
        return parts[0]
    return tuple(
        jnp.concatenate([p[i] for p in parts], axis=0) for i in range(3)
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _rounds_fs_seg(spec, fr: df.FieldSpec, c: int, rounds: int,
                   fr_bits: int, use_v2: bool,
                   X, Y, inf, a, b, gm, hm, one_q, p2, st, pos, pb):
    """`rounds` IPA rounds + on-chip Fiat-Shamir at the CURRENT width
    (a.shape[0]) in one program — the per-segment core of the FS
    prover (see ipa_prove_fs; one segment covers the whole proof when
    no shrink applies).

    Returns (a, b, gm, hm, st, pos, pb, LRx, LRy (rounds, 2, 16)
    canonical affine coords, LRinf (rounds, 2), us (rounds, 16)
    Montgomery challenges, ok)."""
    from . import fs
    from . import msm2
    from . import proj as dpj

    fq = spec.fq
    N = a.shape[0]
    # static byte sizes derive from the fq modulus bit length
    fq_bits = fq.p.bit_length()
    lg_n = rounds

    LRx = jnp.zeros((lg_n, 2, N_LIMBS), U32)
    LRy = jnp.zeros((lg_n, 2, N_LIMBS), U32)
    LRinf = jnp.zeros((lg_n, 2), jnp.bool_)
    us = jnp.zeros((lg_n, N_LIMBS), U32)
    ok0 = jnp.bool_(True)

    def body(r, carry):
        a, b, gm, hm, st, pos, pb, LRx, LRy, LRinf, us, ok = carry
        cur = (jnp.uint32(N) >> r.astype(U32))
        m = cur >> 1
        curm1 = cur - 1
        rows, bm, cq = _round_scalars_compact.__wrapped__(
            fr, a, b, gm, hm, one_q, m, curm1
        )
        if use_v2:
            pts = dpj.to_jacobian(
                spec, msm2.msm2_impl(spec, c, X, Y, inf, rows, bm)
            )
        else:
            pts = dmsm.msm_impl(spec, c, X, Y, inf, rows, base_map=bm)
        qj = _mul_point_dev(spec, p2, cq)
        S = dc.add(spec, pts, qj)
        s_inf = dc.is_zero(spec, S)
        if dc.is_te(spec):
            # extended -> affine: x = X/Z, y = Y/Z
            zi = fs.mont_pow_pm2.__wrapped__(fq, S[3])
            xa = df.mont_mul(fq, S[0], zi)
            ya = df.mont_mul(fq, S[1], zi)
        else:
            # Jacobian -> affine: x = X/Z^2, y = Y/Z^3
            zi = fs.mont_pow_pm2.__wrapped__(fq, S[2])
            zi2 = df.mont_sqr(fq, zi)
            xa = df.mont_mul(fq, S[0], zi2)
            ya = df.mont_mul(fq, S[1], df.mont_mul(fq, zi2, zi))
        xc = df.from_mont(fq, xa)
        yc = df.from_mont(fq, ya)
        if dc.is_te(spec):
            # identity encodes naturally as (0, 1); no flag bits
            Lb = fs.te_point_uncompressed_bytes(fq, fq_bits, xc[0], yc[0])
            Rb = fs.te_point_uncompressed_bytes(fq, fq_bits, xc[1], yc[1])
        else:
            Lb = fs.point_uncompressed_bytes(
                fq, fq_bits, xc[0], yc[0], s_inf[0]
            )
            Rb = fs.point_uncompressed_bytes(
                fq, fq_bits, xc[1], yc[1], s_inf[1]
            )
        st, pos, pb = fs.append_message(st, pos, pb, b"L", Lb)
        st, pos, pb = fs.append_message(st, pos, pb, b"R", Rb)
        st, pos, pb, seed = fs.challenge_bytes(st, pos, pb, b"u", 32)
        u, ok_u = fs.fr_rand_from_seed(fr, fr_bits, seed)
        ui = fs.mont_pow_pm2.__wrapped__(fr, u)
        a, b, gm, hm = _fold.__wrapped__(fr, a, b, gm, hm, u, ui, m, curm1)
        LRx = LRx.at[r].set(xc)
        LRy = LRy.at[r].set(yc)
        LRinf = LRinf.at[r].set(s_inf)
        us = us.at[r].set(u)
        return (a, b, gm, hm, st, pos, pb, LRx, LRy, LRinf, us, ok & ok_u)

    carry = (a, b, gm, hm, st, pos, pb, LRx, LRy, LRinf, us, ok0)
    return jax.lax.fori_loop(0, lg_n, body, carry)


@jax.jit
def _fs_pack(segs, a, b, st, pos, pb, ok):
    """Concat per-segment outputs into ONE flat u32 vector so the host
    needs a single fetch (ten separate np.asarray calls are ten
    blocking tunnel RPCs)."""
    LRx = jnp.concatenate([s[0] for s in segs], axis=0)
    LRy = jnp.concatenate([s[1] for s in segs], axis=0)
    LRinf = jnp.concatenate([s[2] for s in segs], axis=0)
    us = jnp.concatenate([s[3] for s in segs], axis=0)
    return jnp.concatenate([
        LRx.reshape(-1), LRy.reshape(-1),
        LRinf.astype(U32).reshape(-1), us.reshape(-1),
        a[0], b[0], st,
        jnp.stack([pos, pb, ok.astype(U32)]),
    ])


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _rounds_fs_batch(spec, fr: df.FieldSpec, c: int, lg_n: int,
                     fr_bits: int, use_v2: bool,
                     X, Y, inf, A, Bv, GM, HM, QW, p2, st, pos, pb):
    """All lg_n rounds for P LOCKSTEP proofs with on-chip Fiat-Shamir.

    st: (P, 200) per-proof STROBE states with SHARED scalar pos/pb (the
    lockstep transcripts perform identical operation sequences, so byte
    positions agree across the batch — ops/fs.py primitives are batch-
    polymorphic over the state's leading dims). Each round runs ONE
    batched 2P-set compact MSM + the vectorized byte layer; the whole
    prover is a single dispatch + a single fetch for all P proofs.
    p2: 2^i * base_B table — the per-proof Q_b = w_b * base_B enters
    through the cq = c_{L/R} * w_b scalars (QW), so one shared table
    serves the batch. Reference: src/inner_product_proof.rs:164-231,
    src/r1cs/prover.rs:777-779."""
    from . import fs
    from . import msm2
    from . import proj as dpj

    fq = spec.fq
    P, N = A.shape[0], A.shape[1]
    fq_bits = fq.p.bit_length()

    LRx = jnp.zeros((lg_n, P, 2, N_LIMBS), U32)
    LRy = jnp.zeros((lg_n, P, 2, N_LIMBS), U32)
    LRinf = jnp.zeros((lg_n, P, 2), jnp.bool_)
    us = jnp.zeros((lg_n, P, N_LIMBS), U32)
    ok0 = jnp.ones((P,), jnp.bool_)

    def body(r, carry):
        A, Bv, GM, HM, st, pos, pb, LRx, LRy, LRinf, us, ok = carry
        cur = jnp.uint32(N) >> r.astype(U32)
        m = cur >> 1
        curm1 = cur - 1
        rows, bm, cq = _round_scalars_compact_batch.__wrapped__(
            fr, A, Bv, GM, HM, QW, m, curm1
        )
        scal = rows.reshape(2 * P, N, N_LIMBS)
        bm_full = jnp.tile(bm, (P, 1))
        if use_v2:
            pts = dpj.to_jacobian(
                spec, msm2.msm2_impl(spec, c, X, Y, inf, scal, bm_full)
            )
        else:
            pts = dmsm.msm_impl(spec, c, X, Y, inf, scal,
                                base_map=bm_full)
        qj = _mul_point_dev(spec, p2, cq.reshape(2 * P, N_LIMBS))
        S = dc.add(spec, pts, qj)  # (2P,) points
        s_inf = dc.is_zero(spec, S).reshape(P, 2)
        if dc.is_te(spec):
            zi = fs.mont_pow_pm2.__wrapped__(fq, S[3])
            xa = df.mont_mul(fq, S[0], zi)
            ya = df.mont_mul(fq, S[1], zi)
        else:
            zi = fs.mont_pow_pm2.__wrapped__(fq, S[2])
            zi2 = df.mont_sqr(fq, zi)
            xa = df.mont_mul(fq, S[0], zi2)
            ya = df.mont_mul(fq, S[1], df.mont_mul(fq, zi2, zi))
        xc = df.from_mont(fq, xa).reshape(P, 2, N_LIMBS)
        yc = df.from_mont(fq, ya).reshape(P, 2, N_LIMBS)
        if dc.is_te(spec):
            Lb = fs.te_point_uncompressed_bytes(
                fq, fq_bits, xc[:, 0], yc[:, 0]
            )
            Rb = fs.te_point_uncompressed_bytes(
                fq, fq_bits, xc[:, 1], yc[:, 1]
            )
        else:
            Lb = fs.point_uncompressed_bytes(
                fq, fq_bits, xc[:, 0], yc[:, 0], s_inf[:, 0]
            )
            Rb = fs.point_uncompressed_bytes(
                fq, fq_bits, xc[:, 1], yc[:, 1], s_inf[:, 1]
            )
        st, pos, pb = fs.append_message(st, pos, pb, b"L", Lb)
        st, pos, pb = fs.append_message(st, pos, pb, b"R", Rb)
        st, pos, pb, seed = fs.challenge_bytes(st, pos, pb, b"u", 32)
        u, ok_u = fs.fr_rand_from_seed(fr, fr_bits, seed)  # (P, 16)
        ui = fs.mont_pow_pm2.__wrapped__(fr, u)
        A, Bv, GM, HM = _fold_batch.__wrapped__(
            fr, A, Bv, GM, HM, u, ui, m, curm1
        )
        LRx = LRx.at[r].set(xc)
        LRy = LRy.at[r].set(yc)
        LRinf = LRinf.at[r].set(s_inf)
        us = us.at[r].set(u)
        return (A, Bv, GM, HM, st, pos, pb, LRx, LRy, LRinf, us,
                ok & ok_u)

    carry = (A, Bv, GM, HM, st, pos, pb, LRx, LRy, LRinf, us, ok0)
    carry = jax.lax.fori_loop(0, lg_n, body, carry)
    A, Bv, GM, HM, st, pos, pb, LRx, LRy, LRinf, us, ok = carry
    # ONE flat fetch for the whole batch
    return jnp.concatenate([
        LRx.reshape(-1), LRy.reshape(-1),
        LRinf.astype(U32).reshape(-1), us.reshape(-1),
        A[:, 0].reshape(-1), Bv[:, 0].reshape(-1), st.reshape(-1),
        jnp.stack([pos, pb]), ok.astype(U32),
    ])


def ipa_prove_fs_batch(transcripts, curve, base_B, ws,
                       G_factors_list, H_factors_list,
                       G_vec, H_vec, a_list, b_list):
    """P lockstep IPA proofs with on-chip Fiat-Shamir: one dispatch +
    one fetch for the WHOLE batch (the per-round lockstep prover still
    pays 2 host RPCs per round). Returns [(L_vec, R_vec, a0, b0)] or
    None when unsupported (divergent transcript positions across the
    batch, or an Fp::rand rejection caught by host replay); callers
    fall back to the per-round IpaBatchProver."""
    from .limbs import int_to_limbs, limbs_to_ints

    spec = dc.spec_for(curve)
    fr = df.spec_for(curve.fr)
    N = len(G_vec)
    P = len(a_list)
    lg_n = N.bit_length() - 1
    p, R = curve.fr.p, curve.fr.R
    fqp = curve.fq.p

    strobes = [t._strobe for t in transcripts]
    if any(
        s.pos != strobes[0].pos or s.pos_begin != strobes[0].pos_begin
        for s in strobes
    ):
        return None  # not lockstep; shared-pos invariant would break

    from . import msm2

    on_tpu = jax.devices()[0].platform != "cpu"
    use_v2 = on_tpu and N >= 16
    c = max(4, msm2.window_bits(N) - 2) if use_v2 else dmsm._window_bits(N)

    from .verify import _IPA_VERIFY_CACHE

    tkey = ("fs-table", curve.name, N,
            G_vec[0], G_vec[-1], H_vec[0], H_vec[-1])
    table = _IPA_VERIFY_CACHE.get(tkey)
    if table is None:
        X, Y, inf = dc.affine_to_device(curve, list(G_vec) + list(H_vec))
        table = (
            jax.device_put(X), jax.device_put(Y),
            jax.device_put(np.asarray(inf)),
        )
        _IPA_VERIFY_CACHE[tkey] = table
    X, Y, inf = table

    def mont2(rows):
        flat = [x % p * R % p for row in rows for x in row]
        return jax.device_put(ints_to_limbs(flat).reshape(P, N, N_LIMBS))

    A = mont2(a_list)
    Bv = mont2(b_list)
    GM = mont2(G_factors_list)
    HM = mont2(H_factors_list)
    QW = jax.device_put(ints_to_limbs([w % p * R % p for w in ws]))
    qx = jnp.asarray(int_to_limbs(base_B[0] * curve.fq.R % fqp))
    qy = jnp.asarray(int_to_limbs(base_B[1] * curve.fq.R % fqp))
    p2 = _q_doubles_jit(spec, qx, qy)

    st = jnp.asarray(np.stack([
        np.frombuffer(bytes(s.state), np.uint8).astype(np.uint32)
        for s in strobes
    ]))
    pos = jnp.uint32(strobes[0].pos)
    pb = jnp.uint32(strobes[0].pos_begin)

    out = _rounds_fs_batch(
        spec, fr, c, lg_n, curve.fr.num_bits, use_v2,
        X, Y, inf, A, Bv, GM, HM, QW, p2, st, pos, pb,
    )
    flat = np.asarray(out)  # ONE fetch for all P proofs
    k = lg_n * P * 2 * N_LIMBS
    LRx = flat[:k].reshape(lg_n, P, 2, N_LIMBS)
    LRy = flat[k:2 * k].reshape(lg_n, P, 2, N_LIMBS)
    off = 2 * k
    LRinf = flat[off:off + lg_n * P * 2].reshape(lg_n, P, 2).astype(bool)
    off += lg_n * P * 2
    us = flat[off:off + lg_n * P * N_LIMBS].reshape(lg_n, P, N_LIMBS)
    off += lg_n * P * N_LIMBS
    a0_l = flat[off:off + P * N_LIMBS].reshape(P, N_LIMBS)
    off += P * N_LIMBS
    b0_l = flat[off:off + P * N_LIMBS].reshape(P, N_LIMBS)
    off += P * N_LIMBS
    st_f = flat[off:off + P * 200].reshape(P, 200)
    off += P * 200
    pos_f, pb_f = flat[off], flat[off + 1]
    ok = flat[off + 2:off + 2 + P]

    if not ok.all():
        return None  # astronomically rare Fp::rand rejection

    from ..transcript import protocol as _protocol

    te = dc.is_te(spec)
    Rinv = curve.fr.R_inv
    results = []
    snapshots = [s.clone() for s in strobes]
    for bi in range(P):
        L_vec, R_vec = [], []
        for r in range(lg_n):
            for side, vec in ((0, L_vec), (1, R_vec)):
                if LRinf[r, bi, side] and not te:
                    vec.append(None)
                else:
                    vec.append((
                        limbs_to_ints(LRx[r, bi, side])[0],
                        limbs_to_ints(LRy[r, bi, side])[0],
                    ))
        t = transcripts[bi]
        for r in range(lg_n):
            _protocol.append_point(t, curve, b"L", L_vec[r])
            _protocol.append_point(t, curve, b"R", R_vec[r])
            u_host = _protocol.challenge_scalar(t, curve, b"u")
            u_dev = limbs_to_ints(us[r, bi])[0] * Rinv % p
            if u_host != u_dev:
                # restore every pre-replay transcript; caller re-proves
                # on the per-round lockstep path
                for tj, snap in zip(transcripts, snapshots):
                    tj._strobe = snap
                return None
        sb = strobes[bi]
        if (bytes(sb.state) != bytes(st_f[bi].astype(np.uint8))
                or sb.pos != int(pos_f) or sb.pos_begin != int(pb_f)):
            raise RuntimeError(
                "device Fiat-Shamir state diverged from host replay"
            )
        a0 = limbs_to_ints(a0_l[bi])[0] * Rinv % p
        b0 = limbs_to_ints(b0_l[bi])[0] * Rinv % p
        results.append((L_vec, R_vec, a0, b0))
    return results


def ipa_prove_fs(transcript, curve, Q, G_factors, H_factors,
                 G_vec, H_vec, a_vec, b_vec):
    """Whole-IPA device proof with on-chip Fiat-Shamir.

    Returns (L_vec, R_vec, a0, b0) — affine int points and final
    scalars — or None when the instance is unsupported (TE curve,
    non-power-of-two, or a Fp::rand rejection detected by the host
    transcript replay; the caller falls back to the per-round path).
    The live `transcript` is advanced exactly as the per-round path
    would (byte-checked against the device's final STROBE state)."""
    from .limbs import int_to_limbs, limbs_to_ints
    from . import msm2

    spec = dc.spec_for(curve)
    fr = df.spec_for(curve.fr)
    N = len(G_vec)
    lg_n = N.bit_length() - 1
    p, R = curve.fr.p, curve.fr.R
    fqp = curve.fq.p

    on_tpu = jax.devices()[0].platform != "cpu"
    use_v2 = on_tpu and N >= 128
    # B=2 batched scalar sets favor a smaller window than the single-set
    # routing: measured (2, 2048) round MSM on the v5e — c=6: 18.9 ms,
    # c=8 (window_bits): 22.7 ms, c=10: 26.0, c=12: 56.4.
    c = max(4, msm2.window_bits(N) - 2) if use_v2 else dmsm._window_bits(N)

    # Generator tables are deterministic artifacts — cache the device
    # upload across proofs (endpoint-keyed like ops/verify.py's verify
    # cache; marshal+upload of 2N points costs ~2 s at N=2^16 through
    # the tunnel).
    from .verify import _IPA_VERIFY_CACHE

    tkey = ("fs-table", curve.name, N,
            G_vec[0], G_vec[-1], H_vec[0], H_vec[-1])
    table = _IPA_VERIFY_CACHE.get(tkey)
    if table is None:
        bases = list(G_vec) + list(H_vec)
        X, Y, inf = dc.affine_to_device(curve, bases)
        table = (
            jax.device_put(X), jax.device_put(Y),
            jax.device_put(np.asarray(inf)),
        )
        _IPA_VERIFY_CACHE[tkey] = table
    X, Y, inf = table

    def mont(xs):
        if not isinstance(xs, (list, tuple)):
            return xs  # already a device Montgomery limb array
        return jax.device_put(ints_to_limbs([x % p * R % p for x in xs]))

    a = mont(a_vec)
    b = mont(b_vec)
    gm = mont(G_factors)
    hm = mont(H_factors)
    one_q = df.mont_one(fr, ())
    qx = jnp.asarray(int_to_limbs(Q[0] * curve.fq.R % fqp))
    qy = jnp.asarray(int_to_limbs(Q[1] * curve.fq.R % fqp))

    strobe = transcript._strobe
    st = jnp.asarray(
        np.frombuffer(bytes(strobe.state), np.uint8).astype(np.uint32)
    )
    pos = jnp.uint32(strobe.pos)
    pb = jnp.uint32(strobe.pos_begin)

    # Segment plan: run `seg` rounds at full width, then materialize the
    # folded table at width/2^seg ON DEVICE (_shrink_fs_dev) and repeat.
    # Every remaining round's compact MSM shrinks from `width` terms to
    # `cur` terms; the segments chain as async device programs with zero
    # host syncs in between, so the shrink that lost out-of-program (per
    # round dispatch/RPC overhead, round 4) is free here. Widths at or
    # below ABTPU_IPA_FS_SEG_MIN run out in one final segment (rounds
    # there are cheap; more segments would only add compiles).
    seg = int(os.environ.get("ABTPU_IPA_FS_SEG", "4"))
    min_w = int(os.environ.get("ABTPU_IPA_FS_SEG_MIN", "8192"))
    p2 = _q_doubles_jit(spec, qx, qy)  # once per proof, all segments

    segs = []
    ok_all = None
    width = N
    r_done = 0
    while r_done < lg_n:
        remaining = lg_n - r_done
        do_shrink = (
            seg > 0 and width > min_w and remaining > seg and use_v2
            and (width >> seg) >= 16
        )
        r = seg if do_shrink else remaining
        v2_w = use_v2 and width >= 128
        c_w = (
            max(4, msm2.window_bits(width) - 2)
            if v2_w else dmsm._window_bits(width)
        )
        res = _rounds_fs_seg(
            spec, fr, c_w, r, curve.fr.num_bits, v2_w,
            X, Y, inf, a, b, gm, hm, one_q, p2, st, pos, pb,
        )
        a, b, gm, hm, st, pos, pb = res[:7]
        segs.append(res[7:11])
        ok_all = res[11] if ok_all is None else ok_all & res[11]
        r_done += r
        if r_done < lg_n and do_shrink:
            cur = width >> seg
            X, Y, inf = _shrink_fs_dev(spec, fr, 1 << seg, X, Y, inf,
                                       gm, hm)
            a, b = a[:cur], b[:cur]
            gm = df.mont_one(fr, (cur,))
            hm = df.mont_one(fr, (cur,))
            width = cur

    out = _fs_pack(segs, a, b, st, pos, pb, ok_all)
    flat = np.asarray(out)  # the ONE device->host fetch of the proof
    k = lg_n * 2 * N_LIMBS
    LRx = flat[:k].reshape(lg_n, 2, N_LIMBS)
    LRy = flat[k:2 * k].reshape(lg_n, 2, N_LIMBS)
    off = 2 * k
    LRinf = flat[off:off + lg_n * 2].reshape(lg_n, 2).astype(bool)
    off += lg_n * 2
    us = flat[off:off + lg_n * N_LIMBS].reshape(lg_n, N_LIMBS)
    off += lg_n * N_LIMBS
    a0_l = flat[off:off + N_LIMBS]
    b0_l = flat[off + N_LIMBS:off + 2 * N_LIMBS]
    off += 2 * N_LIMBS
    st_f = flat[off:off + 200]
    pos_f, pb_f, ok = flat[off + 200], flat[off + 201], flat[off + 202]

    if not bool(ok):
        return None  # astronomically rare Fp::rand rejection

    L_vec, R_vec = [], []
    for r in range(lg_n):
        for side, vec in ((0, L_vec), (1, R_vec)):
            if LRinf[r, side] and not dc.is_te(spec):
                vec.append(None)  # SW identity (TE: (0, 1) is ordinary)
            else:
                vec.append((
                    limbs_to_ints(LRx[r, side])[0],
                    limbs_to_ints(LRy[r, side])[0],
                ))

    # Host transcript replay: advances the live transcript AND verifies
    # the device byte layer agreed with the host model at every step.
    from ..transcript import protocol as _protocol

    snapshot = strobe.clone()
    for r in range(lg_n):
        _protocol.append_point(transcript, curve, b"L", L_vec[r])
        _protocol.append_point(transcript, curve, b"R", R_vec[r])
        u_host = _protocol.challenge_scalar(transcript, curve, b"u")
        u_dev = limbs_to_ints(us[r])[0] * curve.fr.R_inv % p
        if u_host != u_dev:
            # restore the pre-replay transcript; caller re-proves on the
            # per-round path
            transcript._strobe = snapshot
            return None
    if (bytes(strobe.state) != bytes(st_f.astype(np.uint8))
            or strobe.pos != int(pos_f)
            or strobe.pos_begin != int(pb_f)):
        raise RuntimeError(
            "device Fiat-Shamir state diverged from host replay"
        )

    Rinv = curve.fr.R_inv
    a0 = limbs_to_ints(a0_l)[0] * Rinv % p
    b0 = limbs_to_ints(b0_l)[0] * Rinv % p
    return L_vec, R_vec, a0, b0


class IpaDeviceProver:
    """Holds the device-resident state for one IPA proof creation."""

    def __init__(self, curve, Q, G_vec, H_vec, G_factors, H_factors,
                 a_vec, b_vec):
        self.curve = curve
        self.spec = dc.spec_for(curve)
        self.fr = df.spec_for(curve.fr)
        N = len(G_vec)
        self.N = N
        self.M = dmsm._pad_pow2(2 * N + 1)
        self.Q = Q  # host affine; compact rounds add c*Q host-side
        bases = list(G_vec) + list(H_vec) + [Q]
        bases += [None] * (self.M - len(bases))
        X, Y, inf = dc.affine_to_device(curve, bases)
        self.X = jax.device_put(X)
        self.Y = jax.device_put(Y)
        self.inf = jax.device_put(np.asarray(inf))
        p, R = curve.fr.p, curve.fr.R

        def mont(xs):
            if not isinstance(xs, (list, tuple)):
                return xs  # already a device Montgomery limb array
            return jax.device_put(ints_to_limbs([x % p * R % p for x in xs]))

        self.a = mont(a_vec)
        self.b = mont(b_vec)
        self.gm = mont(G_factors)
        self.hm = mont(H_factors)
        self.c = dmsm._window_bits(self.M)
        self.c_compact = dmsm._window_bits(N)
        self._one_q = df.mont_one(self.fr, ())
        self._pending_fold = None  # (u, u_inv, cur) under the fused path

        # Mesh-sharded vector phase: shard the length-N witness/weight
        # state itself (SURVEY.md §5 "sharded length-n") when an engine
        # mesh divides N; rounds then run the static-`cur` programs and
        # GSPMD moves only the live prefix between devices.
        from .. import engine as _engine

        mesh = _engine.active_mesh()
        self._sharded = (
            mesh is not None
            and mesh.devices.size > 1
            and N > 0
            and N % mesh.devices.size == 0
        )
        if self._sharded:
            from ..parallel.mesh import data_sharding

            sh = data_sharding(mesh)
            self.a, self.b, self.gm, self.hm = (
                jax.device_put(x, sh)
                for x in (self.a, self.b, self.gm, self.hm)
            )
            self._one = df.mont_one(self.fr, ())

        # Fused one-dispatch rounds (TPU, single chip, v2-eligible):
        # every tunnel dispatch is a ~27.5 ms RPC, so the round's
        # fold/scalars/MSM/pack phases run as ONE program (_round_step).
        self._fused = (
            not self._sharded
            and jax.devices()[0].platform != "cpu"
            and isinstance(self.spec, (dc.CurveSpec, dc.TECurveSpec))
            and N >= 128
        )

    def _u_limbs(self, u: int, u_inv: int):
        p, R = self.curve.fr.p, self.curve.fr.R
        return (
            jnp.asarray(ints_to_limbs([u * R % p])[0]),
            jnp.asarray(ints_to_limbs([u_inv * R % p])[0]),
        )

    def _host_lr(self, arr):
        """(2*C + 2, 16) fetch block -> host (L, R) with the c*Q term
        added (C = 3 SW Jacobian / 4 TE extended coords)."""
        nc = 4 if dc.is_te(self.spec) else 3
        jacs = dc.point_batch_ints(
            self.curve, arr[:2 * nc].reshape(nc, 2, N_LIMBS)
        )
        qj = _host_q_jacs(
            self.curve, self.Q, _cq_ints(self.curve, arr[2 * nc:])
        )
        return self.curve.batch_to_affine(
            [self.curve.proj_add(jacs[j], qj[j]) for j in range(2)]
        )

    def _shrinkable(self, cur: int) -> bool:
        t = _shrink_threshold()
        return (
            t > 0
            and not self._sharded
            and not dc.is_te(self.spec)  # fold MSM path is SW-only
            and cur >= 16
            and self.N // cur >= t
        )

    def _shrink(self, cur: int) -> None:
        """Materialize the folded table at width `cur` (see module note
        above): one batched base_map MSM over the T = N/cur segments per
        live slot, one host affine roundtrip, weights reset to one."""
        self._apply_pending_fold()
        N, T = self.N, self.N // cur
        # Segment-major weight gather: set j's scalars are
        # gm[j], gm[j+cur], ..., gm[j+(T-1)*cur] — a reshape+transpose,
        # no gather op needed.
        gm_r = jnp.transpose(self.gm.reshape(T, cur, N_LIMBS), (1, 0, 2))
        hm_r = jnp.transpose(self.hm.reshape(T, cur, N_LIMBS), (1, 0, 2))
        scal = df.from_mont_fast(
            self.fr, jnp.concatenate([gm_r, hm_r], axis=0)
        )  # (2*cur, T, 16) canonical
        bm = (
            np.arange(cur, dtype=np.int32)[:, None]
            + np.arange(T, dtype=np.int32)[None, :] * cur
        )
        bm = jnp.asarray(np.concatenate([bm, bm + N], axis=0))  # (2cur, T)
        # Chunk the scalar-set axis: one fused dispatch over all 2*cur
        # sets scales its intermediates as 16*B*W*T u32 — ~8.6 GB per
        # array at N=2^20 (cur=2^13, T=128, W=64), an HBM OOM. Bounded
        # slices keep each dispatch's temps ~0.5 GB while the slices
        # stay wide enough to fill the VPU.
        b_cap = int(os.environ.get("ABTPU_IPA_SHRINK_SETS", "1024"))
        cw = dmsm._window_bits(T)
        parts = [
            jnp.stack(
                _msm_pair(
                    self.spec, cw, self.X, self.Y, self.inf,
                    scal[s:s + b_cap], bm[s:s + b_cap],
                )
            )
            for s in range(0, 2 * cur, b_cap)
        ]
        jacs = dc.jacobian_batch_ints(
            self.curve,
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1),
        )
        aff = self.curve.batch_to_affine(jacs)
        X, Y, inf = dc.affine_to_device(self.curve, aff)
        self.X = jax.device_put(X)
        self.Y = jax.device_put(Y)
        self.inf = jax.device_put(np.asarray(inf))
        self.a = self.a[:cur]
        self.b = self.b[:cur]
        self.gm = df.mont_one(self.fr, (cur,))
        self.hm = df.mont_one(self.fr, (cur,))
        self.N = cur
        self.M = dmsm._pad_pow2(2 * cur + 1)
        self.c = dmsm._window_bits(self.M)
        self.c_compact = dmsm._window_bits(cur)
        # Post-shrink width can drop below every v2 routing threshold
        # (e.g. N=2^18, T=128 shrinks to 2048 then 16): re-gate the
        # fused path so sub-128 rounds use the compact v1 dispatch
        # instead of driving msm2 in an untested tiny-n regime.
        if self._fused and cur < 128:
            self._fused = False

    def round_commit(self, cur: int):
        """Compute (L, R) host affine points for the current round."""
        if self._shrinkable(cur):
            self._shrink(cur)
        if self._sharded:
            # Mesh path: full-width rows (the base_map indirection would
            # gather across the sharded table axis).
            scal2 = _round_scalars_sharded(
                self.fr, self.a, self.b, self.gm, self.hm, self._one,
                cur, self.M,
            )
            pts = _msm_pair(
                self.spec, self.c, self.X, self.Y, self.inf, scal2
            )
            host = dc.jacobian_batch_to_host(self.curve, jnp.stack(pts))
            return host[0], host[1]
        if self._fused:
            from . import msm2

            pend = self._pending_fold
            self._pending_fold = None
            if pend is None:
                z = jnp.zeros(N_LIMBS, U32)
                u_l = ui_l = z
                fm = fc = jnp.uint32(0)
            else:
                u_l, ui_l = self._u_limbs(pend[0], pend[1])
                fm, fc = jnp.uint32(pend[2] // 2), jnp.uint32(pend[2] - 1)
            self.a, self.b, self.gm, self.hm, fetch = _round_step(
                self.spec, self.fr, msm2.window_bits(self.N),
                pend is not None,
                self.X, self.Y, self.inf,
                self.a, self.b, self.gm, self.hm, self._one_q,
                u_l, ui_l, fm, fc,
                jnp.uint32(cur // 2), jnp.uint32(cur - 1),
            )
            return self._host_lr(np.asarray(fetch))
        rows, bm, cq = _round_scalars_compact(
            self.fr, self.a, self.b, self.gm, self.hm, self._one_q,
            jnp.uint32(cur // 2), jnp.uint32(cur - 1),
        )
        pts = _msm_pair(
            self.spec, self.c_compact, self.X, self.Y, self.inf, rows, bm
        )
        # ONE fetch: 2 point partials + the 2 Q scalars ride together
        # in the sync the Fiat-Shamir chain needs anyway (2*C coord
        # rows: C=3 SW Jacobian / 4 TE extended).
        arr = np.asarray(
            jnp.concatenate(
                [jnp.stack(pts).reshape(2 * len(pts), N_LIMBS), cq],
                axis=0,
            )
        )
        return self._host_lr(arr)

    def fold(self, cur: int, u: int, u_inv: int):
        if self._fused:
            # Defer: the fold rides the NEXT round's fused program (or
            # final_ab) — zero standalone dispatches.
            self._pending_fold = (u, u_inv, cur)
            return
        u_l, ui_l = self._u_limbs(u, u_inv)
        if self._sharded:
            self.a, self.b, self.gm, self.hm = _fold_sharded(
                self.fr, self.a, self.b, self.gm, self.hm,
                u_l, ui_l, cur,
            )
        else:
            self.a, self.b, self.gm, self.hm = _fold(
                self.fr, self.a, self.b, self.gm, self.hm,
                u_l, ui_l,
                jnp.uint32(cur // 2), jnp.uint32(cur - 1),
            )

    def _apply_pending_fold(self):
        pend = self._pending_fold
        if pend is None:
            return
        self._pending_fold = None
        u_l, ui_l = self._u_limbs(pend[0], pend[1])
        self.a, self.b, self.gm, self.hm = _fold(
            self.fr, self.a, self.b, self.gm, self.hm, u_l, ui_l,
            jnp.uint32(pend[2] // 2), jnp.uint32(pend[2] - 1),
        )

    def final_ab(self) -> tuple[int, int]:
        from .limbs import limbs_to_int

        self._apply_pending_fold()
        Rinv = self.curve.fr.R_inv
        p = self.curve.fr.p
        a0 = limbs_to_int(np.asarray(self.a[0])) * Rinv % p
        b0 = limbs_to_int(np.asarray(self.b[0])) * Rinv % p
        return a0, b0


# --- cross-proof batched prover (SURVEY.md hard-part #4) ----------------


@partial(jax.jit, static_argnums=(0, 8))
def _round_scalars_batch(fr: df.FieldSpec, A, Bv, GM, HM, QW, m, curm1,
                         M: int):
    """Vmapped `_round_scalars` over a leading proof axis, with the
    per-proof Q-scalar factor QW folded into the c_L/c_R column.

    A, Bv, GM, HM: (P, N, 16) Montgomery; QW: (P, 16) Montgomery (the
    R1CS challenge w_b, since Q_b = w_b * B the base table stays shared
    across proofs, reference src/r1cs/prover.rs:777-779).
    Returns (P, 2, M, 16) canonical scalars.
    """

    def one(a, b, gm, hm, qw):
        rows = _round_scalars_mont(fr, a, b, gm, hm, qw, m, curm1, M)
        return rows

    return jax.vmap(one)(A, Bv, GM, HM, QW)


def _rows_math(fr, a, b, gm, hm, qw, a_up, b_up, a_dn, b_dn,
               right, active, M):
    """Shared round-scalar body: callers supply gathers + masks."""
    left = ~right
    prods = df.mont_mul(
        fr,
        jnp.stack([a_dn, b_up, a_up, b_dn, a, a_up]),
        jnp.stack([gm, hm, gm, hm, b_up, b]),
    )
    gw_L = df.select(right, prods[0], jnp.zeros_like(prods[0]))
    hw_L = df.select(left, prods[1], jnp.zeros_like(prods[1]))
    gw_R = df.select(left, prods[2], jnp.zeros_like(prods[2]))
    hw_R = df.select(right, prods[3], jnp.zeros_like(prods[3]))
    zero = jnp.zeros_like(a)
    c_L = df.sum_mod(fr, df.select(active, prods[4], zero))
    c_R = df.sum_mod(fr, df.select(active, prods[5], zero))
    c_LR = df.mont_mul(fr, jnp.stack([c_L, c_R]), jnp.stack([qw, qw]))

    N = a.shape[0]
    pad = jnp.zeros((M - 2 * N - 1, N_LIMBS), U32)
    row_L = jnp.concatenate([gw_L, hw_L, c_LR[0][None], pad], axis=0)
    row_R = jnp.concatenate([gw_R, hw_R, c_LR[1][None], pad], axis=0)
    return df.from_mont(fr, jnp.stack([row_L, row_R]))


def _round_scalars_mont(fr, a, b, gm, hm, qw, m, curm1, M):
    """Body shared with `_round_scalars`, with a Q-column factor."""
    N = a.shape[0]
    idx = jnp.arange(N, dtype=U32)
    i = idx & curm1
    right = i >= m
    active = idx < m

    up_idx = (i + m).astype(jnp.int32)
    a_up = jnp.take(a, up_idx, axis=0, mode="clip")
    b_up = jnp.take(b, up_idx, axis=0, mode="clip")
    dn_idx = jnp.maximum(i.astype(jnp.int32) - m.astype(jnp.int32), 0)
    a_dn = jnp.take(a, dn_idx, axis=0, mode="clip")
    b_dn = jnp.take(b, dn_idx, axis=0, mode="clip")
    return _rows_math(fr, a, b, gm, hm, qw, a_up, b_up, a_dn, b_dn,
                      right, active, M)


@partial(jax.jit, static_argnums=(0,))
def _fold_batch(fr: df.FieldSpec, A, Bv, GM, HM, U, U_inv, m, curm1):
    def one(a, b, gm, hm, u, u_inv):
        return _fold.__wrapped__(fr, a, b, gm, hm, u, u_inv, m, curm1)

    return jax.vmap(one)(A, Bv, GM, HM, U, U_inv)


class IpaBatchProver:
    """Device state for P proofs created in LOCKSTEP over one shared
    base table [G | H | B].

    The reference creates proofs one at a time (inner_product_proof.rs:
    76-231), paying lg(n) sequential host syncs each; batching amortizes
    every sync across P transcripts and turns each round's 2P MSMs into
    ONE batched-scalar-set device MSM. Bit-identical proofs: the scalar
    at the B column is c_L * w_b, and c_L * w_b * B == c_L * Q_b.
    """

    def __init__(self, curve, base_B, ws, G_vec, H_vec,
                 G_factors_list, H_factors_list, a_list, b_list):
        self.curve = curve
        self.spec = dc.spec_for(curve)
        self.fr = df.spec_for(curve.fr)
        P = len(a_list)
        N = len(G_vec)
        self.P, self.N = P, N
        self.M = dmsm._pad_pow2(2 * N + 1)
        self.base_B = base_B  # host affine; compact rounds add c*w*B
        bases = list(G_vec) + list(H_vec) + [base_B]
        bases += [None] * (self.M - len(bases))
        X, Y, inf = dc.affine_to_device(curve, bases)
        self.X = jax.device_put(X)
        self.Y = jax.device_put(Y)
        self.inf = jax.device_put(np.asarray(inf))
        p, R = curve.fr.p, curve.fr.R

        # Compact rounds need single-device MSMs (the base_map
        # indirection gathers across what would be the sharded axis);
        # with an active multi-device mesh keep the full-width rows.
        from .. import engine as _engine

        mesh = _engine.active_mesh()
        self._compact = mesh is None or mesh.devices.size <= 1

        def mont2(rows):
            flat = [x % p * R % p for row in rows for x in row]
            return jax.device_put(
                ints_to_limbs(flat).reshape(P, N, N_LIMBS)
            )

        self.A = mont2(a_list)
        self.B = mont2(b_list)
        self.GM = mont2(G_factors_list)
        self.HM = mont2(H_factors_list)
        self.QW = jax.device_put(
            ints_to_limbs([w % p * R % p for w in ws])
        )
        self.c = dmsm._window_bits(self.M)
        self.c_compact = dmsm._window_bits(N)
        self._pending_fold = None
        # Fused one-dispatch rounds (see IpaDeviceProver._fused).
        self._fused = (
            self._compact
            and jax.devices()[0].platform != "cpu"
            and isinstance(self.spec, (dc.CurveSpec, dc.TECurveSpec))
            and N >= 16
        )

    def _u_limbs_batch(self, us, u_invs):
        p, R = self.curve.fr.p, self.curve.fr.R
        U = jnp.asarray(ints_to_limbs([u % p * R % p for u in us]))
        Ui = jnp.asarray(ints_to_limbs([u % p * R % p for u in u_invs]))
        return U, Ui

    def _host_lrs(self, arr):
        """((2C+2)P, 16) fetch block -> [(L_b, R_b)] host affine pairs
        (C = 3 SW Jacobian / 4 TE extended coords)."""
        P = self.P
        nc = 4 if dc.is_te(self.spec) else 3
        jacs = dc.point_batch_ints(
            self.curve, arr[: 2 * nc * P].reshape(nc, 2 * P, N_LIMBS)
        )
        qj = _host_q_jacs(
            self.curve, self.base_B,
            _cq_ints(self.curve, arr[2 * nc * P:]),
        )
        aff = self.curve.batch_to_affine(
            [self.curve.proj_add(jacs[k], qj[k]) for k in range(2 * P)]
        )
        return [(aff[2 * b], aff[2 * b + 1]) for b in range(P)]

    def round_commit(self, cur: int):
        """[(L_b, R_b)] host affine points for the current round."""
        m = jnp.uint32(cur // 2)
        curm1 = jnp.uint32(cur - 1)
        P = self.P
        if not self._compact:
            rows = _round_scalars_batch(
                self.fr, self.A, self.B, self.GM, self.HM, self.QW,
                m, curm1, self.M,
            )  # (P, 2, M, 16)
            scal = rows.reshape(2 * P, self.M, N_LIMBS)
            pts = _msm_pair(
                self.spec, self.c, self.X, self.Y, self.inf, scal
            )
            # ONE fetch for all 2P points (per-point fetches are ~29 ms
            # tunnel RPCs each — see jacobian_batch_to_host).
            host = dc.jacobian_batch_to_host(self.curve, jnp.stack(pts))
            return [(host[2 * b], host[2 * b + 1]) for b in range(P)]
        if self._fused:
            from . import msm2

            pend = self._pending_fold
            self._pending_fold = None
            if pend is None:
                Z = jnp.zeros((P, N_LIMBS), U32)
                U = Ui = Z
                fm = fc = jnp.uint32(0)
            else:
                U, Ui = self._u_limbs_batch(pend[0], pend[1])
                fm, fc = jnp.uint32(pend[2] // 2), jnp.uint32(pend[2] - 1)
            self.A, self.B, self.GM, self.HM, fetch = _round_step_batch(
                self.spec, self.fr, msm2.window_bits(self.N),
                pend is not None,
                self.X, self.Y, self.inf,
                self.A, self.B, self.GM, self.HM, self.QW,
                U, Ui, fm, fc, m, curm1,
            )
            return self._host_lrs(np.asarray(fetch))
        rows, bm, cq = _round_scalars_compact_batch(
            self.fr, self.A, self.B, self.GM, self.HM, self.QW, m, curm1
        )  # (P, 2, N, 16), (2, N), (P, 2, 16)
        scal = rows.reshape(2 * P, self.N, N_LIMBS)
        bm_full = jnp.tile(bm, (P, 1))  # (2P, N); cur is batch-wide
        pts = _msm_pair(
            self.spec, self.c_compact, self.X, self.Y, self.inf, scal,
            bm_full,
        )
        arr = np.asarray(
            jnp.concatenate(
                [
                    jnp.stack(pts).reshape(2 * len(pts) * P, N_LIMBS),
                    cq.reshape(2 * P, N_LIMBS),
                ],
                axis=0,
            )
        )
        return self._host_lrs(arr)

    def fold(self, cur: int, us: list[int], u_invs: list[int]):
        if self._fused:
            self._pending_fold = (us, u_invs, cur)  # rides the next step
            return
        U, Ui = self._u_limbs_batch(us, u_invs)
        self.A, self.B, self.GM, self.HM = _fold_batch(
            self.fr, self.A, self.B, self.GM, self.HM, U, Ui,
            jnp.uint32(cur // 2), jnp.uint32(cur - 1),
        )

    def final_ab(self) -> list[tuple[int, int]]:
        from .limbs import limbs_to_int

        pend = self._pending_fold
        if pend is not None:
            self._pending_fold = None
            U, Ui = self._u_limbs_batch(pend[0], pend[1])
            self.A, self.B, self.GM, self.HM = _fold_batch(
                self.fr, self.A, self.B, self.GM, self.HM, U, Ui,
                jnp.uint32(pend[2] // 2), jnp.uint32(pend[2] - 1),
            )
        Rinv = self.curve.fr.R_inv
        p = self.curve.fr.p
        A = np.asarray(self.A[:, 0])
        B = np.asarray(self.B[:, 0])
        return [
            (
                limbs_to_int(A[b]) * Rinv % p,
                limbs_to_int(B[b]) * Rinv % p,
            )
            for b in range(self.P)
        ]
