"""v2 mega-kernels (ops/kernels2.py) vs exact host group math.

Interpret-mode (CPU) checks at tiny shapes: grids of 2x2 cells so the
scratch-carry path across invocations is exercised, `rows`-batched
bodies with the fori accumulator, identity lanes, and repeated-point
(doubling) lanes. Full-msm2 interpret compiles are pathological on
XLA:CPU (see tests/test_ops_msm2.py), but per-kernel shapes stay at a
handful of inlined group-law bodies. Covers the kernels behind
`ark_ec::VariableBaseMSM::msm` bucket reductions
(reference src/inner_product_proof.rs:104).
"""

import numpy as np
import pytest

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import kernels2 as k2
from ark_bulletproofs_tpu.ops.limbs import N_LIMBS

pytestmark = pytest.mark.heavy

CURVE = curves.secq256k1


def _rand_points(curve, n, seed=7):
    rng = ChaChaRng(bytes([seed]) + bytes(31))
    return [curve.rand(rng) for _ in range(n)]


def _host_add(curve, A, B):
    """Affine host addition (None = identity)."""
    if A is None:
        return B
    if B is None:
        return A
    return curve.add(A, B)


def _lane_to_host(curve, lX, lY, lZ, r, lane):
    """One projective (NL,) lane of (R, NL, L) locals -> host affine."""
    spec = dc.spec_for(curve)
    P = tuple(np.asarray(a[r, :, lane]).reshape(N_LIMBS) for a in (lX, lY, lZ))
    from ark_bulletproofs_tpu.ops import proj as dpj

    return dpj.point_to_host(curve, P)


def _affine_grid(curve, R, L, seed):
    """(R, L) grid of host points with identity and repeated lanes."""
    pts = _rand_points(curve, R * L, seed)
    grid = [[pts[r * L + c] for c in range(L)] for r in range(R)]
    # lane 1: identity in every row; lane 2: same point repeated
    for r in range(R):
        grid[r][1] = None
        grid[r][2] = pts[2]
    grid[0][3] = None  # lone identity at the scanned end
    return grid


def test_suffix_madd_scan_matches_host():
    R, L, block, rows = 8, 512, 256, 4  # grid (2, 2): carries + batching
    curve = CURVE
    spec = dc.spec_for(curve)
    grid = _affine_grid(curve, R, L, seed=3)
    XY = np.zeros((R, N_LIMBS, L), np.uint32)
    for r in range(R):
        Xr, Yr, inf = dc.affine_to_device(curve, grid[r])
        Xr, Yr = np.asarray(Xr), np.asarray(Yr)
        Yr[np.asarray(inf)] = 0  # identity encoding: y = 0
        Xr[np.asarray(inf)] = 0
        XY[r] = (Xr | (Yr << 16)).T  # packed 16-bit limb planes
    lX, lY, lZ = k2.suffix_madd_scan(spec, XY, block, rows)
    lX, lY, lZ = (np.asarray(a) for a in (lX, lY, lZ))
    for lane in (0, 1, 2, 3, 255, 256, 511):
        acc = None
        for r in range(R - 1, -1, -1):
            acc = _host_add(curve, acc, grid[r][lane])
            got = _lane_to_host(curve, lX, lY, lZ, r, lane)
            assert got == acc, f"lane {lane} row {r}"


def _proj_rows(curve, Rb, L, seed):
    """Projective rows with Z != 1 (device-doubled) + identity lanes.

    Returns (device (Rb, NL, L) x3, host affine grid)."""
    from ark_bulletproofs_tpu.ops import proj as dpj

    spec = dc.spec_for(curve)
    grid = _affine_grid(curve, Rb, L, seed)
    tX = np.zeros((Rb, N_LIMBS, L), np.uint32)
    tY = np.zeros((Rb, N_LIMBS, L), np.uint32)
    tZ = np.zeros((Rb, N_LIMBS, L), np.uint32)
    host = [[None] * L for _ in range(Rb)]
    for r in range(Rb):
        Xr, Yr, inf = dc.affine_to_device(curve, grid[r])
        infc = np.asarray(inf)[:, None]
        one = np.asarray(df.mont_one(spec.fq, (L,)))
        # identity lanes -> the valid representative (0 : 1 : 0)
        Xp = np.where(infc, 0, np.asarray(Xr)).astype(np.uint32)
        Yp = np.where(infc, one, np.asarray(Yr)).astype(np.uint32)
        Z = np.where(infc, 0, one).astype(np.uint32)
        # double on device -> Z != 1 projective representatives
        D = dpj.double(spec, (Xp, Yp, Z))
        tX[r] = np.asarray(D[0]).T
        tY[r] = np.asarray(D[1]).T
        tZ[r] = np.asarray(D[2]).T
        host[r] = [
            None if p is None else curve.add(p, p) for p in grid[r]
        ]
    return (tX, tY, tZ), host


def test_suffix_jac_scan_and_rowsum_match_host():
    Rb, L, block, rows = 8, 256, 128, 4
    curve = CURVE
    spec = dc.spec_for(curve)
    (tX, tY, tZ), host = _proj_rows(curve, Rb, L, seed=5)
    ex, ey, ez, tx, ty, tz = k2.suffix_jac_scan(spec, tX, tY, tZ, block=block, rows=rows)
    ex, ey, ez = (np.asarray(a) for a in (ex, ey, ez))
    tot3 = tuple(np.asarray(a)[None] for a in (tx, ty, tz))
    for lane in (0, 1, 2, 128, 255):
        acc = None
        for r in range(Rb - 1, -1, -1):
            got = _lane_to_host(curve, ex, ey, ez, r, lane)
            assert got == acc, f"excl lane {lane} row {r}"  # BEFORE row r
            acc = _host_add(curve, acc, host[r][lane])
        assert _lane_to_host(curve, *tot3, 0, lane) == acc, f"tot {lane}"
    # rowsum: totals only, ascending accumulation order
    ox, oy, oz = k2.rowsum_jac(spec, tX, tY, tZ, block=block, rows=rows)
    out3 = tuple(np.asarray(a)[None] for a in (ox, oy, oz))
    for lane in (0, 1, 2, 255):
        acc = None
        for r in range(Rb):
            acc = _host_add(curve, acc, host[r][lane])
        assert _lane_to_host(curve, *out3, 0, lane) == acc, f"sum {lane}"


def test_horner_windows_matches_host():
    W, c, L = 3, 4, 128
    curve = CURVE
    spec = dc.spec_for(curve)
    (tX, tY, tZ), host = _proj_rows(curve, W, L, seed=9)
    ox, oy, oz = k2.horner_windows(spec, tX, tY, tZ, c, L)
    out3 = tuple(np.asarray(a)[None] for a in (ox, oy, oz))
    for lane in (0, 1, 2, 127):
        acc = None
        for w in range(W - 1, -1, -1):  # acc = 2^c acc + part[w]
            if acc is not None:
                for _ in range(c):
                    acc = curve.add(acc, acc)
            acc = _host_add(curve, acc, host[w][lane])
        assert _lane_to_host(curve, *out3, 0, lane) == acc, f"lane {lane}"
