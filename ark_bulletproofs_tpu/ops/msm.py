"""Device (JAX) multi-scalar multiplication: TPU-native Pippenger.

Replaces the reference's `ark_ec::VariableBaseMSM::msm` (Pippenger over
rayon; call sites e.g. reference src/inner_product_proof.rs:104,124,
src/r1cs/prover.rs:516,532,546, src/r1cs/verifier.rs:574,685).

Design constraints measured on hardware:
  * one group-law invocation (a fused jac-add subgraph) costs ~0.2 ms of
    device time regardless of lane width, so runtime ~= (# sequential
    point-op steps) * 0.2 ms + (total element-adds) / VPU throughput;
  * XLA compile time scales with group-law *instantiations* (~25 s each),
    so log-unrolled trees with shrinking shapes are unaffordable.

Hence everything here maximizes lane width and minimizes sequential
steps with a ~10-instantiation budget:

  1. windows are processed in batched GROUPS of up to 8 (a leading lane
     axis, not a loop) — digits/argsort/gather all vectorize;
  2. *telescoped bucket reduction*: with points sorted by digit, the
     window sum  sum_j j*B_j  equals  sum_i delta_i * T_i  where
     delta_i = d_i - d_{i-1} >= 0 is nonzero only at segment starts and
     T_i is the PLAIN suffix sum of the sorted points (telescoping:
     sum_i d_i P_i = sum_k delta_k sum_{i>=k} P_i). No dense bucket
     tables, no segmented scans, no scatters;
  3. suffix sums: one short scan over R = n/C rows of (G, C)-wide mixed
     adds (madd-2007-bl — addends are affine inputs), then a
     Hillis-Steele suffix (log2 C steps, fixed width) for the column
     carries. Carries materialize only at the <= 2^c segment starts
     (compacted with lax.top_k);
  4. the weighted sum  sum delta_j * T_j  expands delta into its c bits
     and tree-reduces a fixed-width (G, c, S) leaf array by halving
     inside one fori_loop, then Horner-combines bits and windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as dc
from . import field as df
from .limbs import N_LIMBS, ints_to_limbs

U32 = jnp.uint32
SCALAR_BITS = 256


def _window_bits(n: int) -> int:
    """Pippenger window size; must divide 16 (limb alignment).

    c=8 balances suffix-scan work against the S = 2^c weighted
    reduction for large n; small sizes use c=4, whose much smaller S
    also sidesteps an XLA:CPU pathological-compile regime observed at
    (S=256, small C) shapes.
    """
    return 8 if n >= 4096 else 4


def _log2(x: int) -> int:
    return x.bit_length() - 1


def _digits_for_windows(scal, ws, c: int):
    """(G, n) digits for (traced) window indices ws (G,).

    scal may be (n, 16) for one scalar set or (B, n, 16) for a batch;
    in the batched case a window index w encodes (set b, window w%W):
    b = w // W. Used to fuse several MSMs over the same bases (e.g. the
    IPA's L and R) into one program with no extra graph size.
    """

    def one(w):
        if scal.ndim == 3:
            W = SCALAR_BITS // c
            s = jax.lax.dynamic_index_in_dim(
                scal, w // W, axis=0, keepdims=False
            )
            w = w % W
        else:
            s = scal
        if c == 16:
            return jax.lax.dynamic_index_in_dim(s, w, axis=1, keepdims=False)
        per = 16 // c
        limb = jax.lax.dynamic_index_in_dim(
            s, w // per, axis=1, keepdims=False
        )
        shift = (w % per).astype(U32) * c
        return (limb >> shift) & jnp.uint32((1 << c) - 1)

    return jax.vmap(one)(ws)


def _hs_suffix(spec, P, length: int):
    """Inclusive suffix sums along axis -2 of (..., C, 16) point coords.

    Hillis-Steele: log2(C) fixed-width steps; O(C log C) work — used only
    on the short column-totals axis where work is negligible.
    """
    steps = max(length - 1, 0).bit_length()
    C = P[0].shape[-2]
    idx = jnp.arange(C, dtype=jnp.int32)

    def body(k, x):
        sh = jnp.int32(1) << k
        part = tuple(
            jnp.take(coord, jnp.minimum(idx + sh, C - 1), axis=-2)
            for coord in x
        )
        ident = dc.point_zero(spec, part[0].shape[:-1])
        mask = (idx + sh) < C
        mask = jnp.broadcast_to(mask, part[0].shape[:-1])
        part = dc.select(mask, part, ident)
        return dc.add(spec, x, part)

    return jax.lax.fori_loop(0, steps, body, P)


def _tree_reduce(spec, P, S: int):
    """Sum along axis -2 of (..., S, 16) coords by fixed-width halving."""
    steps = _log2(S)
    idx = jnp.arange(S, dtype=jnp.int32)

    def body(k, x):
        half = jnp.int32(S) >> (k + 1)
        part = tuple(
            jnp.take(coord, jnp.minimum(idx + half, S - 1), axis=-2)
            for coord in x
        )
        ident = dc.point_zero(spec, part[0].shape[:-1])
        mask = jnp.broadcast_to(idx < half, part[0].shape[:-1])
        part = dc.select(mask, part, ident)
        return dc.add(spec, x, part)

    out = jax.lax.fori_loop(0, steps, body, P)
    return tuple(coord[..., 0, :] for coord in out)


def msm_impl(spec, c: int, X, Y, inf, scal, axis_name=None, base_map=None):
    """Full Pippenger MSM on device (pure function; jit via msm_device).

    X, Y: (n, 16) affine Montgomery limbs; inf: (n,) bool; scal: (n, 16)
    canonical scalar limbs — or (B, n, 16) for B scalar sets over the
    SAME bases (returns B points, one per set; the window axis of all
    sets is flattened through the same group machinery). n must be a
    power of two. `axis_name` marks execution inside a shard_map body so
    replicated scan-carry inits are pvary'd (vma consistency).

    base_map (B, n) int32, optional: per-set base indirection — scalar j
    of set b multiplies table row base_map[b, j]; X/Y/inf may then be
    WIDER than n. Composed into the sorted-order gather (zero extra
    passes); lets callers avoid padding zero scalars when each set
    touches an n-subset of a shared table (e.g. IPA compact rounds).
    """
    n = scal.shape[-2] if base_map is not None else X.shape[0]
    B = scal.shape[0] if scal.ndim == 3 else 1
    W = SCALAR_BITS // c
    BW = B * W
    G = min(BW, 8)
    n_groups = BW // G
    S = min(1 << c, n)
    # R rows of linear scan work (n mixed adds) over C columns whose
    # carries are Hillis-Steele'd (C log C general adds) — small R keeps
    # the sequential step count low while the HS work stays a modest
    # fraction of the scan work.
    R = min(n, 32)
    C = n // R
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def group_body(carry0, gidx):
        ws = gidx * G + jnp.arange(G, dtype=U32)
        digits = _digits_for_windows(scal, ws, c)  # (G, n)
        order = jnp.argsort(digits, axis=-1)
        sd = jnp.take_along_axis(digits, order, axis=-1)

        # --- suffix sums over sorted points (column-major chunks) -----
        # flat sorted index i = col*R + r  ->  [r, G, col]; gather the
        # points DIRECTLY into that layout (transposing the small index
        # array instead of three big limb arrays).
        if base_map is not None:
            bm_g = jnp.take(
                base_map.astype(jnp.int32), (ws // W).astype(jnp.int32),
                axis=0,
            )  # (G, n)
            order = jnp.take_along_axis(bm_g, order, axis=-1)
        idx_rgc = order.reshape(G, C, R).transpose(2, 0, 1)  # (R, G, C)
        cX, cY = X[idx_rgc], Y[idx_rgc]  # (R, G, C, 16)
        cI = inf[idx_rgc]

        def row_body(acc, row):
            qx, qy, qi = row
            acc = dc.add_mixed(spec, acc, qx, qy, qi)
            return acc, acc

        rev = (jnp.flip(cX, 0), jnp.flip(cY, 0), jnp.flip(cI, 0))
        tot, local_rev = jax.lax.scan(
            row_body, dc.pvary_point(dc.point_zero(spec, (G, C)), axis_name), rev
        )
        local = tuple(jnp.flip(a, 0) for a in local_rev)  # (R, G, C, 16)

        # exclusive suffix of column totals via Hillis-Steele + shift
        incl = _hs_suffix(spec, tot, C)  # (G, C, 16)
        cidx = jnp.arange(C, dtype=jnp.int32)
        excl = tuple(
            jnp.take(a, jnp.minimum(cidx + 1, C - 1), axis=-2) for a in incl
        )
        ident_gc = dc.point_zero(spec, (G, C))
        last = jnp.broadcast_to(cidx + 1 < C, (G, C))
        excl = dc.select(last, excl, ident_gc)

        # --- segment starts (delta > 0), compacted to S slots ---------
        prev = jnp.pad(sd[:, :-1], ((0, 0), (1, 0)))
        delta = sd - prev  # (G, n); delta_0 = sd_0
        starts = delta > 0
        key = jnp.where(starts, (n - iota_n).astype(jnp.int32), 0)
        vals, _ = jax.lax.top_k(key, S)  # (G, S), descending = pos ascending
        valid = vals > 0
        pos = jnp.where(valid, n - vals, 0)
        dsel = jnp.where(
            valid, jnp.take_along_axis(delta, pos.astype(jnp.int32), -1), 0
        )

        # materialize suffix at the selected positions
        r_i = (pos % R).astype(jnp.int32)  # (G, S)
        c_i = (pos // R).astype(jnp.int32)
        g_i = jnp.arange(G, dtype=jnp.int32)[:, None]
        T_loc = tuple(a[r_i, g_i, c_i] for a in local)  # (G, S, 16)
        T_car = tuple(a[g_i, c_i] for a in excl)
        Ts = dc.add(spec, T_loc, T_car)

        # --- weighted sum  sum_j dsel_j * Ts_j  via delta bit-planes --
        bit = jnp.arange(c, dtype=U32)[None, :, None]  # (1, c, 1)
        mask = ((dsel[:, None, :] >> bit) & 1) > 0  # (G, c, S)
        Tb = tuple(jnp.broadcast_to(a[:, None], (G, c, S, N_LIMBS)) for a in Ts)
        leaves = dc.select(mask, Tb, dc.point_zero(spec, (G, c, S)))
        bitsums = _tree_reduce(spec, leaves, S)  # (G, c) points

        # Horner over delta bits: acc = 2*acc + bitsum[t], t = c-1..0
        def bit_body(acc, t):
            b = tuple(a[:, t] for a in bitsums)
            return dc.double_k_add(spec, acc, b, 1), None

        ts = jnp.arange(c - 1, -1, -1, dtype=jnp.int32)
        wsum, _unused = jax.lax.scan(
            bit_body, dc.pvary_point(dc.point_zero(spec, (G,)), axis_name), ts
        )
        return carry0, wsum  # (G,) points

    gids = jnp.arange(n_groups, dtype=U32)
    _, parts = jax.lax.scan(group_body, 0, gids)  # (n_groups, G, ...)
    # flattened window index = b*W + w  ->  (B, W, ...), then scan the
    # window axis with a (B,)-wide Horner accumulator
    partials = tuple(
        jnp.flip(a.reshape((B, W) + a.shape[2:]), axis=1).swapaxes(0, 1)
        for a in parts
    )  # (W, B, ...), top window first

    # Horner over windows, top window first: acc = 2^c * acc + W_w
    def horner_body(acc, part):
        return dc.double_k_add(spec, acc, part, c), None

    acc, _ = jax.lax.scan(
        horner_body, dc.pvary_point(dc.point_zero(spec, (B,)), axis_name), partials
    )
    if scal.ndim == 2:
        return tuple(a[0] for a in acc)
    return acc


msm_device = jax.jit(msm_impl, static_argnums=(0, 1))


# --- host-facing wrapper ------------------------------------------------


def _pad_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def msm(curve, bases: list, scalars: list[int]):
    """Host-facing device MSM: affine int points + int scalars -> affine.

    Routes through the ragged driver (parallel/msm.py): the base axis is
    split into power-of-two chunks instead of padding to the next power
    of two (protocol MSMs like the prover's [B | G | H] = 2n+1 layout
    would otherwise DOUBLE, reference src/r1cs/prover.rs:516), each chunk
    takes the mesh/v2/v1 fast path, and only a sub-chunk remainder is
    padded — so repeated protocol calls share compiled programs at
    canonical power-of-two widths.
    """
    assert len(bases) == len(scalars)
    n = len(bases)
    if n == 0:
        return curve.zero()
    spec = dc.spec_for(curve)
    fr_p = curve.fr.p
    ks = [s % fr_p for s in scalars]

    X, Y, inf = dc.affine_to_device(curve, list(bases))
    scal = ints_to_limbs(ks)
    from ..parallel.msm import msm_device_ragged

    out = msm_device_ragged(spec, X, Y, np.asarray(inf), scal)
    return dc.point_to_host(curve, out)


jacobian_to_host = dc.point_to_host  # legacy alias for external callers


def msm_many(curve, bases: list, scalar_sets: list[list[int]]):
    """B MSMs over SHARED bases in one device program (batched
    scalar-set mode). Returns a list of affine points, one per set.

    Replaces B sequential `VariableBaseMSM::msm` calls with identical
    bases (e.g. the prover's phase-1 A_I/A_O/S commitments across a
    proof batch, reference src/r1cs/prover.rs:516-559). Base axis is
    chunk-split like `msm` (no next-power-of-two padding)."""
    n = len(bases)
    if n == 0 or not scalar_sets:
        return [curve.zero() for _ in scalar_sets]
    spec = dc.spec_for(curve)
    fr_p = curve.fr.p
    B = len(scalar_sets)
    flat: list[int] = []
    for ks in scalar_sets:
        assert len(ks) == n
        flat.extend(s % fr_p for s in ks)

    X, Y, inf = dc.affine_to_device(curve, list(bases))
    scal = ints_to_limbs(flat).reshape(B, n, 16)
    from ..parallel.msm import msm_device_ragged

    out = msm_device_ragged(spec, X, Y, np.asarray(inf), scal)
    return [
        dc.point_to_host(curve, tuple(a[b] for a in out)) for b in range(B)
    ]


def msm_many_tabled(curve, table, scalar_sets, index_map):
    """B MSMs over rows of a CACHED device table (no base marshal).

    table: (X, Y, inf) device arrays; scalar_sets: B lists of k ints;
    index_map: (k,) int32 rows of the table the scalars multiply. The
    scalar axis pads to a power of two (padding scalars are zero and
    point at row 0), one batched base_map MSM runs, and ONE fetch
    returns all B points (the per-set `point_to_host` of `msm_many`
    costs a blocking ~30 ms RPC each through the tunnel)."""
    B = len(scalar_sets)
    k = len(index_map)
    spec = dc.spec_for(curve)
    fr_p = curve.fr.p
    m = _pad_pow2(k)
    flat: list[int] = []
    for ks in scalar_sets:
        assert len(ks) == k
        flat.extend(s % fr_p for s in ks)
    scal = np.zeros((B, m, 16), np.uint32)
    scal[:, :k] = ints_to_limbs(flat).reshape(B, k, 16)
    bm = np.zeros((B, m), np.int32)
    bm[:, :k] = np.asarray(index_map, np.int32)[None]
    X, Y, inf = table[:3]
    from ..parallel.msm import msm_device_maybe_sharded

    out = msm_device_maybe_sharded(
        spec, _window_bits(m), X, Y, inf,
        jax.device_put(scal), jax.device_put(bm),
    )
    return dc.point_batch_to_host(curve, jnp.stack(out))  # one fetch
