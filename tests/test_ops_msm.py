"""Device Pippenger MSM vs the exact host Pippenger.

Shapes are deliberately shared across cases: each distinct (padded n,
curve) pair costs a full XLA compile of the MSM program, so all
secq256k1 cases use padded n = 8, plus one n = 32 sweep.
"""

import random

import numpy as np
import pytest

from ark_bulletproofs_tpu import curves, engine
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import msm as dmsm


def _rand_points(curve, n, seed=11):
    rng = ChaChaRng(bytes([seed]) + bytes(31))
    return [curve.rand(rng) for _ in range(n)]


def test_msm_small_and_edges():
    """n in {5..8} (one padded shape) incl. identity bases, edge scalars."""
    curve = curves.secq256k1
    rng = random.Random(100)
    pts8 = _rand_points(curve, 8, seed=1)
    for n in (5, 8):
        pts = pts8[:n]
        ks = [rng.randrange(curve.fr.p) for _ in range(n)]
        assert dmsm.msm(curve, pts, ks) == curve.msm(pts, ks)
    # edge scalars + identity base, same padded shape
    pts = list(pts8[:6])
    pts[2] = None
    ks = [0, 1, 5, curve.fr.p - 1, curve.fr.p, curve.fr.p + 3]
    got = dmsm.msm(curve, pts, ks)
    assert got == curve.msm(pts, [k % curve.fr.p for k in ks])
    # all-zero scalars -> identity
    assert dmsm.msm(curve, pts8[:8], [0] * 8) is None
    # duplicated points (exercises the doubling branch in bucket sums)
    dup = [pts8[0]] * 8
    ks = [rng.randrange(curve.fr.p) for _ in range(8)]
    assert dmsm.msm(curve, dup, ks) == curve.msm(dup, ks)


@pytest.mark.heavy
def test_msm_n32():
    curve = curves.secq256k1
    rng = random.Random(132)
    pts = _rand_points(curve, 32, seed=2)
    ks = [rng.randrange(curve.fr.p) for _ in range(32)]
    assert dmsm.msm(curve, pts, ks) == curve.msm(pts, ks)


@pytest.mark.heavy
def test_msm_zorro():
    curve = curves.zorro
    rng = random.Random(7)
    pts = _rand_points(curve, 8, seed=9)
    ks = [rng.randrange(curve.fr.p) for _ in range(8)]
    assert dmsm.msm(curve, pts, ks) == curve.msm(pts, ks)


@pytest.mark.heavy
def test_msm_curve25519_te():
    """Twisted-Edwards device kernels (extended coordinates)."""
    curve = curves.curve25519
    rng = random.Random(9)
    pts = _rand_points(curve, 8, seed=17)
    pts[3] = curve.zero()  # TE identity is an ordinary point
    ks = [rng.randrange(curve.fr.p) for _ in range(8)]
    ks[5] = 0
    assert dmsm.msm(curve, pts, ks) == curve.msm(pts, ks)


def test_engine_dispatch_device(monkeypatch):
    """Force the engine onto the device path and compare with host."""
    curve = curves.secq256k1
    rng = random.Random(8)
    pts = _rand_points(curve, 8, seed=13)
    ks = [rng.randrange(curve.fr.p) for _ in range(8)]
    monkeypatch.setattr(engine.config, "backend", "jax")
    got = engine.msm(curve, pts, ks)
    monkeypatch.setattr(engine.config, "backend", "host")
    want = engine.msm(curve, pts, ks)
    assert got == want
