"""Device Pippenger MSM vs the exact host Pippenger."""

import random

import numpy as np
import pytest

from ark_bulletproofs_tpu import curves, engine
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import msm as dmsm


def _rand_points(curve, n, seed=11):
    rng = ChaChaRng(bytes([seed]) + bytes(31))
    return [curve.rand(rng) for _ in range(n)]


@pytest.mark.parametrize("curve", [curves.secq256k1], ids=lambda c: c.name)
@pytest.mark.parametrize("n", [1, 2, 7, 32])
def test_msm_matches_host(curve, n):
    rng = random.Random(100 + n)
    pts = _rand_points(curve, n, seed=n % 250)
    ks = [rng.randrange(curve.fr.p) for _ in range(n)]
    got = dmsm.msm(curve, pts, ks)
    assert got == curve.msm(pts, ks)


def test_msm_edge_scalars():
    curve = curves.secq256k1
    pts = _rand_points(curve, 6, seed=42)
    pts[2] = None  # identity base
    ks = [0, 1, 5, curve.fr.p - 1, curve.fr.p, curve.fr.p + 3]
    got = dmsm.msm(curve, pts, ks)
    assert got == curve.msm(pts, [k % curve.fr.p for k in ks])


def test_msm_zorro():
    curve = curves.zorro
    rng = random.Random(7)
    pts = _rand_points(curve, 5, seed=9)
    ks = [rng.randrange(curve.fr.p) for _ in range(5)]
    assert dmsm.msm(curve, pts, ks) == curve.msm(pts, ks)


def test_engine_dispatch_device(monkeypatch):
    """Force the engine onto the device path and compare with host."""
    curve = curves.secq256k1
    rng = random.Random(8)
    pts = _rand_points(curve, 9, seed=13)
    ks = [rng.randrange(curve.fr.p) for _ in range(9)]
    monkeypatch.setattr(engine.config, "backend", "jax")
    got = engine.msm(curve, pts, ks)
    monkeypatch.setattr(engine.config, "backend", "host")
    want = engine.msm(curve, pts, ks)
    assert got == want
