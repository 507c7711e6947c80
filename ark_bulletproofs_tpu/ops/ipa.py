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
    prods = df.mont_mul(
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
def _msm_pair(spec, c, X, Y, inf, scal):
    from ..parallel.msm import msm_device_maybe_sharded

    return msm_device_maybe_sharded(spec, c, X, Y, inf, scal)


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

    def round_commit(self, cur: int):
        """Compute (L, R) host affine points for the current round."""
        if self._sharded:
            scal2 = _round_scalars_sharded(
                self.fr, self.a, self.b, self.gm, self.hm, self._one,
                cur, self.M,
            )
        else:
            scal2 = _round_scalars(
                self.fr, self.a, self.b, self.gm, self.hm,
                jnp.uint32(cur // 2), jnp.uint32(cur - 1), self.M,
            )
        pts = _msm_pair(self.spec, self.c, self.X, self.Y, self.inf, scal2)
        host = dc.jacobian_batch_to_host(self.curve, jnp.stack(pts))
        return host[0], host[1]

    def fold(self, cur: int, u: int, u_inv: int):
        p, R = self.curve.fr.p, self.curve.fr.R
        u_l = ints_to_limbs([u * R % p])[0]
        ui_l = ints_to_limbs([u_inv * R % p])[0]
        if self._sharded:
            self.a, self.b, self.gm, self.hm = _fold_sharded(
                self.fr, self.a, self.b, self.gm, self.hm,
                jnp.asarray(u_l), jnp.asarray(ui_l), cur,
            )
        else:
            self.a, self.b, self.gm, self.hm = _fold(
                self.fr, self.a, self.b, self.gm, self.hm,
                jnp.asarray(u_l), jnp.asarray(ui_l),
                jnp.uint32(cur // 2), jnp.uint32(cur - 1),
            )

    def final_ab(self) -> tuple[int, int]:
        from .limbs import limbs_to_int

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
        bases = list(G_vec) + list(H_vec) + [base_B]
        bases += [None] * (self.M - len(bases))
        X, Y, inf = dc.affine_to_device(curve, bases)
        self.X = jax.device_put(X)
        self.Y = jax.device_put(Y)
        self.inf = jax.device_put(np.asarray(inf))
        p, R = curve.fr.p, curve.fr.R

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

    def round_commit(self, cur: int):
        """[(L_b, R_b)] host affine points for the current round."""
        m = jnp.uint32(cur // 2)
        curm1 = jnp.uint32(cur - 1)
        rows = _round_scalars_batch(
            self.fr, self.A, self.B, self.GM, self.HM, self.QW,
            m, curm1, self.M,
        )  # (P, 2, M, 16)
        scal = rows.reshape(2 * self.P, self.M, N_LIMBS)
        pts = _msm_pair(self.spec, self.c, self.X, self.Y, self.inf, scal)
        # ONE fetch for all 2P points (per-point fetches are ~29 ms
        # tunnel RPCs each — see jacobian_batch_to_host).
        host = dc.jacobian_batch_to_host(self.curve, jnp.stack(pts))
        return [(host[2 * b], host[2 * b + 1]) for b in range(self.P)]

    def fold(self, cur: int, us: list[int], u_invs: list[int]):
        p, R = self.curve.fr.p, self.curve.fr.R
        U = jnp.asarray(ints_to_limbs([u % p * R % p for u in us]))
        Ui = jnp.asarray(ints_to_limbs([u % p * R % p for u in u_invs]))
        self.A, self.B, self.GM, self.HM = _fold_batch(
            self.fr, self.A, self.B, self.GM, self.HM, U, Ui,
            jnp.uint32(cur // 2), jnp.uint32(cur - 1),
        )

    def final_ab(self) -> list[tuple[int, int]]:
        from .limbs import limbs_to_int

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
