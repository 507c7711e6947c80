"""Scan-ified point reductions (compile-friendly, work-efficient).

XLA compile time scales with the number of group-law instantiations in
the graph (~25s each), so log-unrolled trees and `associative_scan` (which
traces its combiner at every recursion level) are unusable for MSM-sized
graphs. Every reduction here is expressed with `lax.scan`, whose body is
traced exactly once:

  - `sum_points`: chunked sum over the leading axis — scan rows of an
    (R, C) reshape with a C-wide accumulator, then scan the C column
    totals with a 1-wide accumulator. 2 instantiations, n + C adds.
  - `suffix_scan_points`: per-column inclusive suffix sums plus exclusive
    column carries, in flat "column-major chunk" order (column c owns the
    contiguous flat range [c*R, (c+1)*R)). Used by the sorted-Pippenger
    MSM; callers combine local suffixes with carries only at the few
    positions they gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import curve as dc
from . import field as df
from .limbs import N_LIMBS


def _split(n: int, max_cols: int = 2048) -> tuple[int, int]:
    """Factor n (a power of two) as (R, C) with C <= max_cols."""
    C = min(n, max_cols)
    return n // C, C


def sum_points(spec, P, max_cols: int = 2048):
    """Sum a (n, ...)-batched Jacobian point over its leading axis."""
    n = P[0].shape[0]
    if n == 1:
        return tuple(c[0] for c in P)
    R, C = _split(n, max_cols)
    rows = tuple(c.reshape(R, C, N_LIMBS) for c in P)

    def row_body(acc, row):
        return dc.add(spec, acc, row), None

    acc0 = dc.point_zero(spec, (C,))
    col_tot, _ = jax.lax.scan(row_body, acc0, rows)

    def col_body(acc, x):
        return dc.add(spec, acc, x), None

    out, _ = jax.lax.scan(col_body, dc.point_zero(spec, ()), col_tot)
    return out


def suffix_scan_points(spec, P, max_cols: int = 2048, affine_in=None):
    """Inclusive suffix sums of a (n, ...)-batched point, flat order.

    Returns (local, carry, R): `local[r, c]` is the suffix sum WITHIN
    column c from row r down; `carry[c]` is the total of all columns
    after c. The true suffix at flat index i (= c*R + r) is
    local[i % R, i // R] + carry[i // R] — callers add the two lazily.

    If `affine_in` is (X, Y, inf_mask) the row scan uses complete mixed
    addition (madd-2007-bl, 11 muls instead of 17) — this scan is the
    dominant MSM cost and its addends are always affine input points.
    """
    if affine_in is not None:
        X, Y, infm = affine_in
        n = X.shape[0]
        R, C = _split(n, max_cols)
        colsX = X.reshape(C, R, N_LIMBS).swapaxes(0, 1)
        colsY = Y.reshape(C, R, N_LIMBS).swapaxes(0, 1)
        colsI = infm.reshape(C, R).swapaxes(0, 1)

        def row_body(acc, row):
            qx, qy, qi = row
            acc = dc.add_mixed(spec, acc, qx, qy, qi)
            return acc, acc

        rev = (
            jnp.flip(colsX, 0),
            jnp.flip(colsY, 0),
            jnp.flip(colsI, 0),
        )
        tot, locals_rev = jax.lax.scan(row_body, dc.point_zero(spec, (C,)), rev)
        local = tuple(jnp.flip(x, axis=0) for x in locals_rev)
    else:
        n = P[0].shape[0]
        R, C = _split(n, max_cols)
        # flat index c*R + r -> [r, c]: reshape to (C, R) then transpose
        cols = tuple(
            x.reshape(C, R, N_LIMBS).swapaxes(0, 1) for x in P
        )  # (R, C, 16)

        def row_body(acc, row):
            acc = dc.add(spec, acc, row)
            return acc, acc

        rev = tuple(jnp.flip(x, axis=0) for x in cols)
        tot, locals_rev = jax.lax.scan(row_body, dc.point_zero(spec, (C,)), rev)
        local = tuple(jnp.flip(x, axis=0) for x in locals_rev)  # (R, C, 16)

    # exclusive suffix over column totals, right to left
    def col_body(acc, x):
        nxt = dc.add(spec, acc, x)
        return nxt, acc

    tot_rev = tuple(jnp.flip(x, axis=0) for x in tot)
    _, carry_rev = jax.lax.scan(col_body, dc.point_zero(spec, ()), tot_rev)
    carry = tuple(jnp.flip(x, axis=0) for x in carry_rev)  # (C, 16)
    return local, carry, R
