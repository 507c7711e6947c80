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
    (c + log2 n <= 32); larger n amortizes more buckets. Below 2^10 the
    bucket stage (XLA-op group adds over (B*W, 2^c)) costs ~20x the
    scan's Pallas madd, so the optimum falls to c ~= lg n - 4
    (measured: n=256 B=256 @ c=8 = 1.03 s/call with S = n buckets/window;
    c=4 lifted the P=128 IPA batch from 18.96 to 27.4 proofs/s)."""
    lg = _log2(n)
    if n >= (1 << 18):
        c = 12
    elif n >= (1 << 13):
        c = 10
    elif n >= (1 << 10):
        c = 8
    else:
        # floor of 4: below that the window count W = ceil(256/c)
        # explodes (c=2 doubles every per-row stage) while the bucket
        # stage S = 2^c is already tiny; measured at the P=128 n=64 IPA
        # batch, c=4 beats c=8 (27.4 vs 18.96 proofs/s at table width
        # 256) and c=2 runs out of rowsum split (S < 16).
        c = max(4, lg - 4)
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


def _shift_up(a, sh: int, m: int):
    """a[..., i+sh, :] for i+sh < m, zero rows beyond — STATIC slices
    (a jnp.take along the middle axis lowers to per-element gathers at
    the XLA ~6 ns/element reorder rate: ~200 ms/step at 33M elements,
    measured in the shrink's carry stage)."""
    pad = jnp.zeros(a.shape[:-2] + (sh,) + a.shape[-1:], a.dtype)
    return jnp.concatenate([a[..., sh:, :], pad], axis=-2)


def _suffix_small(spec, P, m: int):
    """(exclusive suffix, inclusive suffix) over axis -2 of (..., m, 16)
    points (m tiny; Hillis-Steele, lg m batched adds)."""
    steps = _log2(m)
    idx = jnp.arange(m, dtype=jnp.int32)
    x = P
    for k in range(steps):
        sh = 1 << k
        part = _tmap(lambda a: _shift_up(a, sh, m), x)
        good = jnp.broadcast_to((idx + sh < m)[None, :], part[0].shape[:-1])
        part = dpj.select(good, part, dpj.point_zero(spec, part[0].shape[:-1]))
        x = dpj.add(spec, x, part)
    # inclusive -> exclusive shift
    part = _tmap(lambda a: _shift_up(a, 1, m), x)
    good = jnp.broadcast_to((idx + 1 < m)[None, :], part[0].shape[:-1])
    excl = dpj.select(good, part, dpj.point_zero(spec, part[0].shape[:-1]))
    return excl, x


def _excl_suffix_small(spec, P, m: int):
    """Exclusive suffix over axis -2 of (..., m, 16) proj points (m tiny)."""
    return _suffix_small(spec, P, m)[0]


class _Cfg:
    """Static shape plan for one (n, c, B) instantiation."""

    __slots__ = ("n", "c", "B", "lg", "W", "BW", "C", "c1", "c2", "R",
                 "L", "S")

    def __init__(self, n: int, c: int, B: int):
        lg = _log2(n)
        # n >= 16 keeps the column-carry split (c1 = 16) well-formed;
        # ROUTING thresholds (V2_MIN_N etc.) live in the callers — e.g.
        # base-mapped IPA rounds run n = 128 compact rows profitably
        # because B*W row count keeps the kernels saturated.
        assert n == 1 << lg and n >= 16
        assert c + lg <= 32
        self.n, self.c, self.B, self.lg = n, c, B, lg
        self.W = -(-SCALAR_BITS // c)  # ceil
        self.BW = B * self.W
        self.C = min(C_COLS, n)
        self.c1, self.c2 = 16, self.C // 16  # column-carry split
        self.R = n // self.C
        self.L = self.BW * self.C
        self.S = 1 << c


def _stage_sort(g: _Cfg, scal):
    """Digits + packed single sort -> (order, sorted digits), (BW, n)."""
    digits = _digits_all(scal, g.c, g.W)  # (BW, n)
    iota = jnp.arange(g.n, dtype=U32)[None, :]
    keys = (digits << g.lg) | iota
    keys = jax.lax.sort(keys, dimension=1)
    order = (keys & jnp.uint32(g.n - 1)).astype(jnp.int32)
    sd = keys >> g.lg  # (BW, n) sorted digits
    return order, sd


def _stage_gather(g: _Cfg, X, Y, inf, order, base_map=None):
    """Gather sorted PACKED coords into the limb-major (R, NL, L) layout.

    sorted flat index i = col*R + r; lane layout l = row*C + col.
    ONE 64-byte-row gather of packed coords (x_i | y_i << 16 — limbs
    are 16-bit, both coords fit one u32 plane; the XLA:TPU gather is
    dispatch-bound ~6 ns/row under 64 bytes and falls off a ~6x cliff
    past that, so packing halves the dominant row count) + an XLA
    limb-major transpose (bandwidth-bound; an in-kernel relayout costs
    ~8x the madd math). Identity rows carry y = 0.

    base_map (B, n) int32, optional: per-scalar-set indirection into a
    base table WIDER than n — composed into the sort order here, so the
    big coordinate gather stays a single pass (zero extra cost). Lets
    callers run n-term MSMs whose bases are a per-set selection from a
    shared table (e.g. the IPA's per-round G-or-H base choice) without
    materializing gathered tables or padding zero scalars."""
    Yz = jnp.where(inf[:, None], jnp.zeros_like(Y), Y)
    XY = X | (Yz << 16)  # (n_table, NL) packed affine coords
    if base_map is not None:
        bm = jnp.repeat(base_map.astype(jnp.int32), g.W, axis=0)  # (BW, n)
        order = jnp.take_along_axis(bm, order, axis=1)
    ord_r = order.reshape(g.BW, g.C, g.R).transpose(2, 0, 1).reshape(g.R, g.L)
    return jnp.swapaxes(XY[ord_r], 1, 2)  # (R, NL, L)


def _stage_carries(g: _Cfg, spec, *locs):
    """Two-level exclusive column-carry suffix -> (BW, C) points.

    col = i1*c2 + i2; level A scans i2 within each chunk. `locs` are
    the NC per-coord local-suffix arrays from the madd scan."""
    c1, c2, BW, C = g.c1, g.c2, g.BW, g.C
    NC = len(locs)
    tot = _tmap(lambda a: a[0], locs)  # (NL, L) column totals
    if C <= 64:
        # Small column counts (small-n batched sets, e.g. the segmented
        # shrink's n=16): no two-level split — ONE suffix_jac_scan with
        # the COLUMN axis as kernel rows and all B*W sets as lanes.
        # The two-level alternatives measured 0.8-1.0 s at the shrink's
        # 2.1M-lane shape: the level-A kernel degenerates to L/block
        # single-row grid steps, and XLA-glue formulations pay ~200 ms
        # PER batched group-add in transposes/padding (dpj.add at
        # (BW, C) lanes) — while this layout runs in ~33 ms.
        t_in = _tmap(
            lambda a: a.reshape(NL, BW, C).transpose(2, 0, 1), tot
        )  # (C, NL, BW): columns become kernel rows
        t_in, La = _pad_lanes(t_in, 512)
        outs = k2.suffix_jac_scan(spec, *t_in)
        return _tmap(
            lambda a: a[:, :, :La].transpose(2, 0, 1),
            outs[:NC],
        )  # (BW, C, NL) exclusive column suffixes
    t4 = _tmap(lambda a: a.reshape(NL, BW, c1, c2), tot)
    lvlA_in = _tmap(
        lambda a: a.transpose(3, 0, 1, 2).reshape(c2, NL, BW * c1), t4
    )
    lvlA_in, La = _pad_lanes(lvlA_in, 512)
    outs = k2.suffix_jac_scan(spec, *lvlA_in)
    excl_parts, ct_parts = outs[:NC], outs[NC:]
    # chunk totals -> point-major (BW, c1, 16), small HS suffix
    ct = _tmap(
        lambda a: a[:, :La].reshape(NL, BW, c1).transpose(1, 2, 0),
        ct_parts,
    )
    ce = _excl_suffix_small(spec, ct, c1)  # (BW, c1, 16) chunk carries
    # within-chunk exclusive, point-major (BW, C) layout (col-ordered)
    e2 = _tmap(
        lambda a: a[:, :, :La]
        .reshape(c2, NL, BW, c1)
        .transpose(2, 3, 0, 1)
        .reshape(BW, C, NL),
        excl_parts,
    )
    ceb = _tmap(
        lambda a: jnp.broadcast_to(a[:, :, None, :], (BW, c1, c2, NL)).reshape(
            BW, C, NL
        ),
        ce,
    )
    return dpj.add(spec, e2, ceb)  # (BW, C) points


def _searchsorted16(sd, S: int):
    """pos[r, j] = #{i : sd[r, i] < j} for j in [0, S) over SORTED rows.

    Drop-in for vmapped `jnp.searchsorted(row, arange(S))`, which lowers
    to a ~lg(n)-step binary search whose per-step (BW, S) element
    gathers run at the XLA:TPU ~6 ns/row reorder rate (measured 32.6 ms
    at n=2^20, S=4096 — tools/probe_msm2_stages.py). This version walks
    a 16x group-max pyramid instead: the pyramid levels are bandwidth-
    bound reduces, each refinement is one 64-byte CONTIGUOUS row gather
    (the sweet spot of the gather cliff, tools/probe_gather.py) plus a
    16-wide compare — ~3 ms for the same shape. Exact: a group of 16
    sorted elements is entirely < j iff its max (last element) is < j,
    so the boundary group index at each level is the count of fully-
    below groups, and the final count telescopes down the pyramid."""
    BW, n = sd.shape
    js = jnp.arange(S, dtype=sd.dtype)
    if n <= 256:
        cmp = (sd[:, :, None] < js[None, None, :]).sum(axis=1)
        return cmp.astype(jnp.int32)
    levels = []
    m = sd
    while m.shape[1] > 256:
        m = m.reshape(BW, m.shape[1] // 16, 16).max(axis=2)
        levels.append(m)
    c = (levels[-1][:, :, None] < js[None, None, :]).sum(axis=1)
    c = c.astype(jnp.int32)  # (BW, S) counts in coarsest units
    for lvl in levels[-2::-1] + [sd]:
        ngrp = lvl.shape[1] // 16
        base = jnp.minimum(c, ngrp - 1)  # boundary group of this level
        # vmapped row[b] on the (ngrp, 16) view lowers to an XLA gather
        # of CONTIGUOUS 64-byte rows (the gather sweet spot) — a fused
        # per-element index formulation gathers BW*S*16 singles instead
        win = jax.vmap(lambda row, b: row[b])(
            lvl.reshape(BW, ngrp, 16), base
        )  # (BW, S, 16)
        c = base * 16 + (win < js[None, :, None]).sum(
            axis=2, dtype=jnp.int32
        )
    return c


def _stage_buckets(g: _Cfg, spec, sd, excl_col, *locs):
    """Bucket reduction via searchsorted-telescoping -> (BW, S) points."""
    S, n, R, C, BW = g.S, g.n, g.R, g.C, g.BW
    js = jnp.arange(S, dtype=U32)
    pos = _searchsorted16(sd, S)  # (BW, S)
    valid = (js[None, :] >= 1) & (pos < n)
    posc = jnp.minimum(pos, n - 1).astype(jnp.int32)
    colj = posc // R
    rj = posc % R
    if R == 1 and C <= 64:
        # Small-set shapes (the segmented shrink's B*W x n<=64 MSMs):
        # R = 1, so every bucket's source lives in its OWN row's C
        # columns. The strided middle-axis gather costs ~26 ns/row x
        # 3*BW*S rows (~660 ms at the n=2^16 shrink's 8.4M slots) and
        # an unrolled where-chain measured ~970 ms — so select via
        # one-hot BATCHED MATMULS on the MXU instead: limbs are 16-bit
        # values, the one-hot picks at most one per output, so float32
        # accumulation is exact (< 2^24).
        oh = (
            posc[:, :, None] == jnp.arange(C, dtype=jnp.int32)
        ).astype(jnp.float32)  # (BW, S, C)

        def pick(a):  # (BW, C, NL) point-major source -> (BW, S, NL)
            # HIGHEST precision: the TPU's default matmul truncates
            # f32 operands to bf16 (8 mantissa bits) — silently wrong
            # for 16-bit limb values. With the multi-pass decomposition
            # the one-hot x u16 products and single-term sums are exact.
            return jnp.einsum(
                "bsc,bcl->bsl", oh, a.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(U32)

        win = _tmap(
            lambda a: a[0].reshape(NL, BW, C).transpose(1, 2, 0), locs
        )  # (BW, C, NL)
        T1 = _tmap(pick, win)
        EC = _tmap(pick, excl_col)
    else:
        lanej = jnp.arange(BW, dtype=jnp.int32)[:, None] * C + colj
        T1 = tuple(a[rj, :, lanej] for a in locs)  # (BW, S, NL) x NC
        EC = _tmap(
            lambda a: a[jnp.arange(BW)[:, None], colj], excl_col
        )  # (BW, S, NL)
    # invalid slots -> the model identity, NOT all-zero
    ident = dpj.point_zero(spec, valid.shape)
    T1 = dpj.select(valid, T1, ident)
    EC = dpj.select(valid, EC, ident)
    return dpj.add(spec, T1, EC)  # (BW, S) points


def _stage_rowsum(g: _Cfg, spec, U):
    """Two-pass row-sum collapse S -> 1 per window -> (NL, >=BW) x3.

    (The unpadded lane count of the result is exactly g.BW.)"""
    S, BW = g.S, g.BW
    K1 = (16 if S <= 1024 else 64) if S >= 16 else S
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
    p2_in, _ = _pad_lanes(p2_in, 128)
    return k2.rowsum_jac(spec, *p2_in, block=128)  # (NL, BW padded)


def _stage_horner(g: _Cfg, spec, wsum):
    """Window recombination -> (B, NL) model-native coords per set.

    acc = 2^c * acc + part[w] over descending windows, ONE fused
    double-k-add kernel launch per window (kernels.rcb_double_k_add_tiled
    / te_double_k_add_tiled) inside a fori so the step compiles once.
    The previous all-windows-in-one-kernel version (kernels2.
    horner_windows) measured 19.1 ms at W=22, c=12, B=1 — ~67 us per
    group op at 128 lanes (tools/probe_msm2_stages.py round 5); W
    fused launches cost ~30-40 us each instead (W*(c+1) SEQUENTIAL
    group ops can't use lanes, so per-launch cost is everything)."""
    from . import curve as dc
    from . import kernels as kk

    B, W = g.B, g.W
    h = _tmap(
        lambda a: a[:, :g.BW].reshape(NL, B, W).transpose(2, 1, 0), wsum
    )  # (W, B, NL) point-major, highest-weight window at row W-1
    acc = _tmap(lambda a: a[W - 1], h)
    if W == 1:
        return acc
    te = dc.is_te(spec)

    def wstep(t, P):
        Q = _tmap(lambda a: jnp.take(a, W - 2 - t, axis=0), h)
        flat, lanes, _ = dc._flat_pad(list(P) + list(Q), (B,))
        f = kk.te_double_k_add_tiled if te else kk.rcb_double_k_add_tiled
        return dc._unflat(f(spec, *flat, g.c), (B,), lanes)

    return jax.lax.fori_loop(0, W - 1, wstep, acc)  # (B, NL)


def msm2_impl(spec, c: int, X, Y, inf, scal, base_map=None):
    """v2 Pippenger. X, Y: (n, 16) affine Montgomery limbs; inf: (n,)
    bool; scal: (n, 16) or (B, n, 16) canonical scalar limbs. n must be
    a power of two >= V2_MIN_N. Returns a projective point: coords (16,)
    for one scalar set, (B, 16) for a batch. Points are homogeneous
    projective (RCB complete formulas) end to end; convert with
    ops/proj.py::point_to_host.

    base_map (B, n) int32, optional: per-set base indirection — scalar j
    of set b multiplies table row base_map[b, j]; X/Y/inf may then be
    wider than n (see _stage_gather)."""
    n = scal.shape[-2] if base_map is not None else X.shape[0]
    g = _Cfg(n, c, scal.shape[0] if scal.ndim == 3 else 1)
    order, sd = _stage_sort(g, scal)
    gxy = _stage_gather(g, X, Y, inf, order, base_map)
    locs = k2.suffix_madd_scan(spec, gxy)
    excl_col = _stage_carries(g, spec, *locs)
    U = _stage_buckets(g, spec, sd, excl_col, *locs)
    wsum = _stage_rowsum(g, spec, U)
    out = _stage_horner(g, spec, wsum)
    if scal.ndim == 2:
        return _tmap(lambda a: a[0], out)
    return out


msm2_device = jax.jit(msm2_impl, static_argnums=(0, 1))


_STAGED_CACHE: dict = {}


def msm2_device_staged(spec, c: int, X, Y, inf, scal, base_map=None):
    """The v2 pipeline as SEVEN host-chained jit programs (one per stage)
    instead of one fused program.

    Measured at n=2^20: the fused program runs 749 ms/call while the
    stages sum to ~384 ms — XLA schedules the single program's ~6 GB of
    big intermediates (gxy 1.5 GB + 3 locals 4.4 GB) with extra copies.
    Chaining the stage jits from the host keeps every dispatch async
    (no host sync between stages) and lets each buffer die at stage
    granularity. Same math, same outputs.
    """
    n = scal.shape[-2] if base_map is not None else X.shape[0]
    key = (spec, c, n, scal.shape[0] if scal.ndim == 3 else 1,
           base_map is not None)
    fns = _STAGED_CACHE.get(key)
    if fns is None:
        g = _Cfg(key[2], c, key[3])

        def j(f):
            return jax.jit(f)

        fns = (
            g,
            j(partial(_stage_sort, g)),
            j(partial(_stage_gather, g)),
            j(partial(_stage_carries, g, spec)),
            j(partial(_stage_buckets, g, spec)),
            j(partial(_stage_rowsum, g, spec)),
            j(partial(_stage_horner, g, spec)),
        )
        _STAGED_CACHE[key] = fns
    g, f_sort, f_gather, f_carries, f_buckets, f_rowsum, f_horner = fns
    order, sd = f_sort(scal)
    gxy = f_gather(X, Y, inf, order, base_map)
    locs = k2.suffix_madd_scan(spec, gxy)
    excl_col = f_carries(*locs)
    U = f_buckets(sd, excl_col, *locs)
    wsum = f_rowsum(U)
    out = f_horner(wsum)
    if scal.ndim == 2:
        return _tmap(lambda a: a[0], out)
    return out


@partial(jax.jit, static_argnums=(0,))
def _to_jac_jit(spec, out):
    return dpj.to_jacobian(spec, out)


# Fused-vs-staged crossover (tools/probe_msm2_staged.py, v5e): at n=2^20
# the one-program pipeline runs 727 ms vs 376 ms staged (XLA schedules
# the ~6 GB of fused-program intermediates with extra copies); at n=2^16
# fused wins slightly (34.0 vs 37.4 ms — staged pays ~7 async dispatch
# latencies). Large sizes chain stage jits from the host, small stay fused.
STAGED_MIN_N = 1 << 17


def msm2_best(spec, c: int, X, Y, inf, scal, base_map=None):
    """Size-routed v2 MSM (projective out): staged above STAGED_MIN_N."""
    n = scal.shape[-2] if base_map is not None else X.shape[0]
    if n >= STAGED_MIN_N:
        return msm2_device_staged(spec, c, X, Y, inf, scal, base_map)
    return msm2_device(spec, c, X, Y, inf, scal, base_map)


def msm2_device_jac(spec, c: int, X, Y, inf, scal, base_map=None):
    """v2 MSM returning JACOBIAN coords (ops/curve.py conventions), for
    drop-in use at protocol call sites built around the v1 contract."""
    return _to_jac_jit(spec, msm2_best(spec, c, X, Y, inf, scal, base_map))
