"""Device MSM v2: Pallas mega-kernel Pippenger (TPU fast path).

Same contract as ops/msm.py::msm_impl (the TPU-native replacement for
`ark_ec::VariableBaseMSM::msm`, reference src/inner_product_proof.rs:104,
src/r1cs/prover.rs:516, src/r1cs/verifier.rs:574), rebuilt around four
fused kernels (ops/kernels2.py) so each phase is ONE launch:

  1. digit windows for ALL windows at once (XLA bit plumbing; any c<=16,
     windows may straddle the 16-bit limbs);
  2. one packed u32 sort per window row: key = digit << log2(n) | index
     (needs c + log2 n <= 32) — sorted digits AND the permutation from a
     single sort;
  3. sorted points gathered into an (R, 16, W*C) limb-major layout and
     suffix-summed per column by `suffix_madd_scan` (R sequential mixed
     adds inside one kernel — the Pippenger work floor, W*n mixed adds);
  4. column-total carries: two-level exclusive suffix (within-chunk via
     `suffix_jac_scan`, across chunks via a short Hillis-Steele);
  5. bucket reduction WITHOUT top_k/delta bit-planes: the window sum
     sum_j j*B_j telescopes to sum_{j>=1} T[pos_j] where T is the global
     suffix sum and pos_j = searchsorted(sorted_digits, j) — S gathered
     points summed by `rowsum_jac` in two passes;
  6. window recombination acc = 2^c acc + part_w fused in
     `horner_windows`.

v1 (ops/msm.py) remains the XLA-op path for CPU meshes and tiny sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import kernels2 as k2
from . import proj as dpj
from .limbs import N_LIMBS

U32 = jnp.uint32
NL = N_LIMBS
SCALAR_BITS = 256
C_COLS = 1024  # column count cap: L = BW * C lanes for the scan kernel
C1, C2 = 16, 64  # two-level split of the column-carry suffix (C1*C2 = C)
V2_MIN_N = 256  # smallest n: C = min(C_COLS, n) columns, R = n/C rows.
# Small-n support exists for BATCHED scalar sets (e.g. the IPA batch
# prover's (2P, 257)-shaped round MSMs): B*W rows of a small sort keep
# the scan lanes saturated even when one set alone wouldn't.


def _log2(x: int) -> int:
    return x.bit_length() - 1


def window_bits(n: int) -> int:
    """Window size for the v2 kernel: bounded by the packed-sort budget
    (c + log2 n <= 32); larger n amortizes more buckets."""
    lg = _log2(n)
    if n >= (1 << 18):
        c = 12
    elif n >= (1 << 13):
        c = 10
    else:
        c = 8
    return min(c, 32 - lg)


def _tmap(f, T):
    return tuple(f(a) for a in T)


def _pad_lanes(T, block):
    L = T[0].shape[-1]
    Lp = ((L + block - 1) // block) * block
    if Lp == L:
        return T, L
    return _tmap(
        lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Lp - L)]), T
    ), L


def _digits_all(scal, c: int, W: int):
    """(n, 16) or (B, n, 16) canonical scalar limbs -> (B*W, n) digits.

    Row ordering is b*W + w. Windows may straddle the 16-bit limbs."""
    if scal.ndim == 2:
        scal = scal[None]
    B = scal.shape[0]
    s = jnp.pad(scal, ((0, 0), (0, 0), (0, 1)))  # 17th zero limb
    rows = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(W):
        lo = w * c
        l0, off = lo >> 4, lo & 15
        v = (s[:, :, l0] >> off) | (s[:, :, l0 + 1] << (16 - off))
        rows.append(v & mask)
    d = jnp.stack(rows, axis=1)  # (B, W, n)
    return d.reshape(B * W, -1)


def _excl_suffix_small(spec, P, m: int):
    """Exclusive suffix over axis -2 of (..., m, 16) proj points (m tiny)."""
    steps = _log2(m)
    idx = jnp.arange(m, dtype=jnp.int32)
    x = P
    for k in range(steps):
        sh = 1 << k
        part = _tmap(
            lambda a: jnp.take(a, jnp.minimum(idx + sh, m - 1), axis=-2), x
        )
        good = jnp.broadcast_to((idx + sh < m)[None, :], part[0].shape[:-1])
        part = dpj.select(good, part, dpj.point_zero(spec, part[0].shape[:-1]))
        x = dpj.add(spec, x, part)
    # inclusive -> exclusive shift
    part = _tmap(lambda a: jnp.take(a, jnp.minimum(idx + 1, m - 1), axis=-2), x)
    good = jnp.broadcast_to((idx + 1 < m)[None, :], part[0].shape[:-1])
    return dpj.select(good, part, dpj.point_zero(spec, part[0].shape[:-1]))


def msm2_impl(spec, c: int, X, Y, inf, scal):
    """v2 Pippenger. X, Y: (n, 16) affine Montgomery limbs; inf: (n,)
    bool; scal: (n, 16) or (B, n, 16) canonical scalar limbs. n must be
    a power of two >= C_COLS. Returns a projective point: coords (16,) for
    one scalar set, (B, 16) for a batch. Points are homogeneous
    projective (RCB complete formulas) end to end; convert with
    ops/proj.py::point_to_host."""
    n = X.shape[0]
    lg = _log2(n)
    assert n == 1 << lg and n >= V2_MIN_N
    assert c + lg <= 32
    B = scal.shape[0] if scal.ndim == 3 else 1
    W = -(-SCALAR_BITS // c)  # ceil
    BW = B * W
    C = min(C_COLS, n)
    c1, c2 = 16, C // 16  # two-level column-carry split (c1 * c2 = C)
    R = n // C
    L = BW * C
    S = 1 << c

    # --- 1-2: digits + packed sort ----------------------------------
    digits = _digits_all(scal, c, W)  # (BW, n)
    iota = jnp.arange(n, dtype=U32)[None, :]
    keys = (digits << lg) | iota
    keys = jax.lax.sort(keys, dimension=1)
    order = (keys & jnp.uint32(n - 1)).astype(jnp.int32)
    sd = keys >> lg  # (BW, n) sorted digits

    # --- 3: gather sorted points, column suffix scan ----------------
    # sorted flat index i = col*R + r; lane layout l = row*C + col.
    # ONE 64-byte-row gather of PACKED coords (x_i | y_i << 16 — limbs
    # are 16-bit, both coords fit one u32 plane; the XLA:TPU gather is
    # dispatch-bound ~6 ns/row under 64 bytes and falls off a ~6x cliff
    # past that, so packing halves the dominant row count) + an XLA
    # limb-major transpose (bandwidth-bound; an in-kernel relayout costs
    # ~8x the madd math). Identity rows carry y = 0.
    Yz = jnp.where(inf[:, None], jnp.zeros_like(Y), Y)
    XY = X | (Yz << 16)  # (n, NL) packed affine coords
    ord_r = order.reshape(BW, C, R).transpose(2, 0, 1).reshape(R, L)
    gxy = jnp.swapaxes(XY[ord_r], 1, 2)  # (R, NL, L)
    lX, lY, lZ = k2.suffix_madd_scan(spec, gxy)
    tot = (lX[0], lY[0], lZ[0])  # (NL, L) column totals

    # --- 4: two-level exclusive column-carry suffix -----------------
    # col = i1*c2 + i2; level A scans i2 within each chunk
    t4 = _tmap(lambda a: a.reshape(NL, BW, c1, c2), tot)
    lvlA_in = _tmap(
        lambda a: a.transpose(3, 0, 1, 2).reshape(c2, NL, BW * c1), t4
    )
    lvlA_in, La = _pad_lanes(lvlA_in, 512)
    e2x, e2y, e2z, ctx, cty, ctz = k2.suffix_jac_scan(spec, *lvlA_in)
    # chunk totals -> point-major (BW, c1, 16), small HS suffix
    ct = _tmap(
        lambda a: a[:, :La].reshape(NL, BW, c1).transpose(1, 2, 0),
        (ctx, cty, ctz),
    )
    ce = _excl_suffix_small(spec, ct, c1)  # (BW, c1, 16) chunk carries
    # within-chunk exclusive, point-major (BW, C) layout (col-ordered)
    e2 = _tmap(
        lambda a: a[:, :, :La]
        .reshape(c2, NL, BW, c1)
        .transpose(2, 3, 0, 1)
        .reshape(BW, C, NL),
        (e2x, e2y, e2z),
    )
    ceb = _tmap(
        lambda a: jnp.broadcast_to(a[:, :, None, :], (BW, c1, c2, NL)).reshape(
            BW, C, NL
        ),
        ce,
    )
    excl_col = dpj.add(spec, e2, ceb)  # (BW, C) points

    # --- 5: bucket reduction via searchsorted-telescoping -----------
    js = jnp.arange(S, dtype=U32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, js))(sd)  # (BW, S)
    valid = (js[None, :] >= 1) & (pos < n)
    posc = jnp.minimum(pos, n - 1).astype(jnp.int32)
    colj = posc // R
    rj = posc % R
    lanej = jnp.arange(BW, dtype=jnp.int32)[:, None] * C + colj
    T1 = tuple(a[rj, :, lanej] for a in (lX, lY, lZ))  # (BW, S, NL)
    EC = _tmap(
        lambda a: a[jnp.arange(BW)[:, None], colj], excl_col
    )  # (BW, S, NL)
    # invalid slots -> projective identity (0 : 1 : 0), NOT all-zero
    ident = dpj.point_zero(spec, valid.shape)
    T1 = dpj.select(valid, T1, ident)
    EC = dpj.select(valid, EC, ident)
    U = dpj.add(spec, T1, EC)  # (BW, S) points

    # two-pass row-sum collapse S -> 1 per window
    K1 = 16 if S <= 1024 else 64
    M1 = S // K1
    p1_in = _tmap(
        lambda a: a.reshape(BW, K1, M1, NL)
        .transpose(1, 3, 0, 2)
        .reshape(K1, NL, BW * M1),
        U,
    )
    p1_in, L1 = _pad_lanes(p1_in, 512)
    part1 = k2.rowsum_jac(spec, *p1_in)  # (NL, BW*M1 padded)
    p2_in = _tmap(
        lambda a: a[:, :L1].reshape(NL, BW, M1).transpose(2, 0, 1), part1
    )
    p2_in, L2 = _pad_lanes(p2_in, 128)
    wsum = k2.rowsum_jac(spec, *p2_in, 128)  # (NL, BW padded)

    # --- 6: Horner window recombination -----------------------------
    # rows b*W + w -> (W, NL, B) with highest window at row W-1
    h_in = _tmap(
        lambda a: a[:, :L2].reshape(NL, B, W).transpose(2, 0, 1), wsum
    )
    h_in, L3 = _pad_lanes(h_in, 128)
    acc = k2.horner_windows(spec, *h_in, c)  # (NL, B padded)
    out = _tmap(lambda a: a[:, :B].T, acc)  # (B, NL)
    if scal.ndim == 2:
        return _tmap(lambda a: a[0], out)
    return out


msm2_device = jax.jit(msm2_impl, static_argnums=(0, 1))


@partial(jax.jit, static_argnums=(0, 1))
def msm2_device_jac(spec, c: int, X, Y, inf, scal):
    """v2 MSM returning JACOBIAN coords (ops/curve.py conventions), for
    drop-in use at protocol call sites built around the v1 contract."""
    return dpj.to_jacobian(spec, msm2_impl(spec, c, X, Y, inf, scal))
