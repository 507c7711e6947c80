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
    Returns (scal2 (2, M, 16) canonical, none) where row 0 = L scalars
    [gw_L | hw_L | c_L | 0...], row 1 = R scalars.
    """
    N = a.shape[0]
    idx = jnp.arange(N, dtype=U32)
    i = idx & curm1  # slot of original index t in the current round
    right = i >= m
    left = ~right
    active = idx < m

    # weight gathers address the FOLDED vectors by slot i, not by t:
    # gw_L[t] = a[i-m]*gm[t] (right slots), hw_L[t] = b[i+m]*hm[t] (left)
    up_idx = (i + m).astype(jnp.int32)
    a_up = jnp.take(a, up_idx, axis=0, mode="clip")
    b_up = jnp.take(b, up_idx, axis=0, mode="clip")
    dn_idx = jnp.maximum(i.astype(jnp.int32) - m.astype(jnp.int32), 0)
    a_dn = jnp.take(a, dn_idx, axis=0, mode="clip")
    b_dn = jnp.take(b, dn_idx, axis=0, mode="clip")

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

    pad = jnp.zeros((M - 2 * N - 1, N_LIMBS), U32)
    row_L = jnp.concatenate([gw_L, hw_L, c_L[None], pad], axis=0)
    row_R = jnp.concatenate([gw_R, hw_R, c_R[None], pad], axis=0)
    return df.from_mont(fr, jnp.stack([row_L, row_R]))


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


# L and R ride the batched-scalar-set mode of msm_impl: one program,
# same graph size as a single MSM, 2x the window groups.
_msm_pair = dmsm.msm_device


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

    def round_commit(self, cur: int):
        """Compute (L, R) host affine points for the current round."""
        m = jnp.uint32(cur // 2)
        curm1 = jnp.uint32(cur - 1)
        scal2 = _round_scalars(
            self.fr, self.a, self.b, self.gm, self.hm, m, curm1, self.M
        )
        pts = _msm_pair(self.spec, self.c, self.X, self.Y, self.inf, scal2)
        L = dc.jacobian_to_host(self.curve, tuple(c[0] for c in pts))
        R = dc.jacobian_to_host(self.curve, tuple(c[1] for c in pts))
        return L, R

    def fold(self, cur: int, u: int, u_inv: int):
        p, R = self.curve.fr.p, self.curve.fr.R
        u_l = ints_to_limbs([u * R % p])[0]
        ui_l = ints_to_limbs([u_inv * R % p])[0]
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
