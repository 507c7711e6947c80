"""Device field kernels vs the exact host field (CPU-emulated TPU path)."""

import random

import numpy as np
import pytest

from ark_bulletproofs_tpu import fields
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import limbs

FIELDS = [
    fields.secq256k1_fq,
    fields.secq256k1_fr,
    fields.zorro_fq,
    fields.ed25519_fq,
]


def _rand_elems(f, n, rng):
    return [rng.randrange(f.p) for _ in range(n)]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(f):
    rng = random.Random(1)
    xs = _rand_elems(f, 17, rng) + [0, 1, f.p - 1]
    arr = limbs.ints_to_limbs(xs)
    assert limbs.limbs_to_ints(arr) == xs


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(f):
    rng = random.Random(2)
    spec = df.spec_for(f)
    n = 64
    a_int = _rand_elems(f, n, rng)
    b_int = _rand_elems(f, n, rng)
    a = limbs.ints_to_limbs(a_int)
    b = limbs.ints_to_limbs(b_int)

    s = np.asarray(df.batch_add(spec, a, b))
    d = np.asarray(df.batch_sub(spec, a, b))
    assert limbs.limbs_to_ints(s) == [f.add(x, y) for x, y in zip(a_int, b_int)]
    assert limbs.limbs_to_ints(d) == [f.sub(x, y) for x, y in zip(a_int, b_int)]

    ng = np.asarray(df.neg(spec, limbs.ints_to_limbs(a_int)))
    assert limbs.limbs_to_ints(ng) == [f.neg(x) for x in a_int]
    # edge cases
    edge = limbs.ints_to_limbs([0, f.p - 1, 1])
    assert limbs.limbs_to_ints(np.asarray(df.neg(spec, edge))) == [
        0,
        1,
        f.p - 1,
    ]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_mul(f):
    rng = random.Random(3)
    spec = df.spec_for(f)
    n = 64
    a_int = _rand_elems(f, n, rng) + [0, 1, f.p - 1, f.p - 1]
    b_int = _rand_elems(f, n, rng) + [f.p - 1, 1, f.p - 1, 0]
    # device works in Montgomery form: mont_mul(aR, bR) = abR
    R = f.R
    aR = limbs.ints_to_limbs([x * R % f.p for x in a_int])
    bR = limbs.ints_to_limbs([x * R % f.p for x in b_int])
    out = np.asarray(df.batch_mont_mul(spec, aR, bR))
    expect = [x * y % f.p * R % f.p for x, y in zip(a_int, b_int)]
    assert limbs.limbs_to_ints(out) == expect


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(f):
    rng = random.Random(4)
    spec = df.spec_for(f)
    xs = _rand_elems(f, 16, rng) + [0, 1, f.p - 1]
    arr = limbs.ints_to_limbs(xs)
    m = df.to_mont(spec, arr)
    assert limbs.limbs_to_ints(np.asarray(m)) == [x * f.R % f.p for x in xs]
    back = df.from_mont(spec, m)
    assert limbs.limbs_to_ints(np.asarray(back)) == xs


def test_mul_small():
    f = fields.secq256k1_fq
    spec = df.spec_for(f)
    rng = random.Random(5)
    xs = _rand_elems(f, 8, rng)
    arr = limbs.ints_to_limbs(xs)
    for c in (1, 2, 3, 4, 6, 7, 8, 977):
        out = np.asarray(df.mul_small(spec, arr, c))
        assert limbs.limbs_to_ints(out) == [x * c % f.p for x in xs]


def test_broadcasting():
    f = fields.secq256k1_fq
    spec = df.spec_for(f)
    rng = random.Random(6)
    xs = _rand_elems(f, 6, rng)
    y = rng.randrange(f.p)
    R = f.R
    a = limbs.ints_to_limbs([x * R % f.p for x in xs]).reshape(2, 3, 16)
    b = limbs.ints_to_limbs([y * R % f.p])[0]  # (16,)
    out = np.asarray(df.mont_mul(spec, a, b)).reshape(6, 16)
    assert limbs.limbs_to_ints(out) == [x * y % f.p * R % f.p for x in xs]
