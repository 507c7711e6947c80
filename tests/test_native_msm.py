"""The single-core C++ Pippenger (csrc/abtpu_msm_cpu.cpp) vs the exact
pure-Python Pippenger.

This native MSM is the measured `vs_baseline` denominator for bench.py
(stand-in for the reference's ark-ec VariableBaseMSM, SURVEY.md §2b —
cargo is not in the image so the reference itself can't be timed) and
the reference-result oracle for large bench workload caches, so it gets
its own correctness gate: random points/scalars plus the edge lanes
(zero scalar, point at infinity, repeated point, scalar = r-1).
"""

import random

import pytest

from ark_bulletproofs_tpu import curves, native
from ark_bulletproofs_tpu.generators import GeneratorsChain


def _to_affine(curve, jac):
    X, Y, Z = jac
    if Z == 0:
        return None
    p = curve.fq.p
    zi = pow(Z, -1, p)
    return (X * zi * zi % p, Y * zi * zi * zi % p)


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("n", [1, 2, 64, 700])
def test_cpu_pippenger_matches_host(n):
    curve = curves.secq256k1
    prng = random.Random(1000 + n)
    pts = GeneratorsChain(curve, b"native-msm").take(n)
    ks = [prng.randrange(curve.fr.p) for _ in range(n)]
    if n >= 64:
        ks[1] = 0
        ks[2] = curve.fr.p - 1
        pts[3] = None
        pts[4] = pts[5]  # repeated base exercises the doubling branch
    want = curve.msm_python([P for P in pts if P is not None],
                            [k for P, k in zip(pts, ks) if P is not None])
    got = _to_affine(curve, native.cpu_pippenger_native(pts, ks))
    assert got == want


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
def test_cpu_pippenger_all_zero():
    curve = curves.secq256k1
    pts = GeneratorsChain(curve, b"native-msm-z").take(8)
    got = _to_affine(curve, native.cpu_pippenger_native(pts, [0] * 8))
    assert got is None  # identity


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
def test_commit_many_matches_sequential():
    """PedersenGens.commit_many == the sequential commit loop, including
    zero-scalar (identity-contribution) lanes."""
    from ark_bulletproofs_tpu.generators import PedersenGens

    curve = curves.secq256k1
    pc = PedersenGens.default(curve)
    prng = random.Random(12)
    vs = [prng.randrange(curve.fr.p) for _ in range(33)]
    rs = [prng.randrange(curve.fr.p) for _ in range(33)]
    vs[0] = 0
    rs[1] = 0
    vs[2] = rs[2] = 0  # commit(0,0) = identity
    vs[3] = curve.fr.p - 1
    got = pc.commit_many(vs, rs)
    want = [pc.commit(v, r) for v, r in zip(vs, rs)]
    assert got == want


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
def test_commit_many_zorro_and_curve_switching():
    """The native layer's runtime curve parameters: zorro (a = 6, the
    general-a Jacobian doubling) matches the host, and switching curves
    invalidates the fixed-base table correctly."""
    from ark_bulletproofs_tpu.generators import PedersenGens

    prng = random.Random(9)
    pcs = {name: PedersenGens.default(curves.ALL_CURVES[name])
           for name in ("zorro", "secq256k1")}
    for _ in range(2):  # interleave to exercise table re-builds
        for name, pc in pcs.items():
            f = pc.curve.fr
            vs = [prng.randrange(f.p) for _ in range(9)]
            rs = [prng.randrange(f.p) for _ in range(9)]
            got = pc.commit_many(vs, rs)
            assert got == [pc.commit(v, r) for v, r in zip(vs, rs)], name


@pytest.mark.skipif(native.lib() is None, reason="native lib unavailable")
def test_cpu_pippenger_window_sweep():
    """Explicit window sizes bracket the auto choice (digit plumbing)."""
    curve = curves.secq256k1
    prng = random.Random(77)
    pts = GeneratorsChain(curve, b"native-msm-w").take(33)
    ks = [prng.randrange(curve.fr.p) for _ in range(33)]
    want = curve.msm(pts, ks)
    for c in (3, 8, 13, 16):
        got = _to_affine(curve, native.cpu_pippenger_native(pts, ks, c=c))
        assert got == want, f"window c={c}"
