"""Field and curve layer: arkworks-parity behavior and group axioms
(mirrors the reference's test_field!/test_group! template coverage,
reference src/curve/zorro/tests.rs:4-6)."""

import pytest

from ark_bulletproofs_tpu import fields
from ark_bulletproofs_tpu.curves import ALL_CURVES, curve25519, secq256k1, zorro
from ark_bulletproofs_tpu.rand import seeded_rng

CURVES = list(ALL_CURVES.values())


@pytest.mark.parametrize("f", [
    fields.secq256k1_fq, fields.secq256k1_fr, fields.zorro_fq,
    fields.zorro_fr, fields.ed25519_fr,
])
def test_field_axioms(f):
    rng = seeded_rng(42)
    a, b, c = f.rand(rng), f.rand(rng), f.rand(rng)
    assert f.mul(a, f.add(b, c)) == f.add(f.mul(a, b), f.mul(a, c))
    assert f.mul(a, f.inv(a)) == 1
    assert f.add(a, f.neg(a)) == 0
    assert f.sub(a, b) == f.add(a, f.neg(b))
    # Fermat
    assert f.pow(a, f.p - 1) == 1


def test_field_rand_is_montgomery_interpreted():
    """Fp::rand interprets sampled limbs as the Montgomery representation."""
    f = fields.secq256k1_fr

    class FixedRng:
        def __init__(self, limbs):
            self.limbs = list(limbs)

        def next_u64(self):
            return self.limbs.pop(0)

    # limbs encode the Montgomery value 1 -> field value R^{-1} mod p
    val = f.rand(FixedRng([1, 0, 0, 0]))
    assert val == f.R_inv
    # limbs encode R mod p -> field value 1
    r = f.R
    limbs = [(r >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]
    assert f.rand(FixedRng(limbs)) == 1


def test_field_rand_rejection():
    """Values >= p must be rejected and resampled."""
    f = fields.secq256k1_fr
    pm1 = f.p  # == p, must be rejected (p has 256 bits so no masking)

    class Seq:
        def __init__(self):
            limbs = [(pm1 >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]
            self.vals = limbs + [2, 0, 0, 0]

        def next_u64(self):
            return self.vals.pop(0)

    assert f.rand(Seq()) == 2 * f.R_inv % f.p


def test_field_shave_bits_255():
    """255-bit moduli mask the top bit before the rejection test."""
    f = fields.ed25519_fq

    class FixedRng:
        def __init__(self):
            # first draw: all-ones limbs -> masked to 2^255 - 1, which is
            # still >= p = 2^255 - 19, so it must be rejected; second draw
            # has a high top limb whose bit 63 must be shaved off.
            self.vals = [0xFFFFFFFFFFFFFFFF] * 4 + [5, 0, 0, 1 << 63]

        def next_u64(self):
            return self.vals.pop(0)

    v = f.rand(FixedRng())
    # after masking the top bit, the second draw encodes Montgomery value 5
    assert v == 5 * f.R_inv % f.p


def test_batch_inversion():
    f = fields.secq256k1_fr
    rng = seeded_rng(3)
    xs = [f.rand(rng) for _ in range(10)]
    xs[3] = 0  # zeros are skipped, arkworks-style
    out = f.batch_inversion(xs)
    for x, y in zip(xs, out):
        if x == 0:
            assert y == 0
        else:
            assert x * y % f.p == 1


def test_sqrt():
    for f in (fields.secq256k1_fq, fields.zorro_fq, fields.ed25519_fq):
        rng = seeded_rng(9)
        for _ in range(5):
            a = f.rand(rng)
            sq = f.mul(a, a)
            r = f.sqrt(sq)
            assert r is not None and f.mul(r, r) == sq


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_on_curve_and_order(curve):
    assert curve.is_on_curve(curve.gen)
    assert curve.is_zero(curve.mul_bigint(curve.gen, curve.fr.p))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_group_axioms(curve):
    rng = seeded_rng(11)
    P = curve.rand(rng)
    Q = curve.rand(rng)
    R = curve.rand(rng)
    assert curve.is_on_curve(P) and curve.is_on_curve(Q)
    # associativity + commutativity
    assert curve.add(curve.add(P, Q), R) == curve.add(P, curve.add(Q, R))
    assert curve.add(P, Q) == curve.add(Q, P)
    # identity / inverse
    assert curve.add(P, curve.zero()) == P
    assert curve.is_zero(curve.add(P, curve.neg(P)))
    # doubling consistency
    assert curve.add(P, P) == curve.double(P)
    # scalar distributivity
    a, b = curve.fr.rand(rng), curve.fr.rand(rng)
    lhs = curve.mul(P, (a + b) % curve.fr.p)
    rhs = curve.add(curve.mul(P, a), curve.mul(P, b))
    assert lhs == rhs
    # rand() lands in the prime-order subgroup
    assert curve.subgroup_check(P)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_msm_matches_naive(curve):
    rng = seeded_rng(5)
    pts = [curve.rand(rng) for _ in range(17)]
    ks = [curve.fr.rand(rng) for _ in range(17)]
    expected = curve.zero()
    for P, k in zip(pts, ks):
        expected = curve.add(expected, curve.mul(P, k))
    assert curve.msm(pts, ks) == expected
    # empty and zero-scalar cases
    assert curve.is_zero(curve.msm([], []))
    assert curve.is_zero(curve.msm(pts[:2], [0, 0]))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_point_serialization_roundtrip(curve):
    rng = seeded_rng(8)
    for _ in range(5):
        P = curve.rand(rng)
        blob = curve.serialize_compressed(P)
        assert curve.deserialize_compressed(blob) == P
        # negated point differs only in its sign flag byte
        blob_neg = curve.serialize_compressed(curve.neg(P))
        assert blob_neg != blob
        assert curve.deserialize_compressed(blob_neg) == curve.neg(P)


def test_sw_identity_serialization():
    c = secq256k1
    blob = c.serialize_compressed(None)
    assert len(blob) == 33
    assert blob[-1] == 1 << 6  # infinity flag
    assert c.deserialize_compressed(blob) is None
    un = c.serialize_uncompressed(None)
    assert len(un) == 65


def test_serialized_sizes():
    # 256-bit base fields serialize points to 33 bytes compressed (2 flag bits)
    assert len(secq256k1.serialize_compressed(secq256k1.gen)) == 33
    assert len(zorro.serialize_compressed(zorro.gen)) == 33
    assert len(secq256k1.serialize_uncompressed(secq256k1.gen)) == 65
    # TE with 255-bit field: 32 bytes compressed (1 flag bit), 64 uncompressed
    assert len(curve25519.serialize_compressed(curve25519.gen)) == 32
    assert len(curve25519.serialize_uncompressed(curve25519.gen)) == 64


def test_deserialize_rejects_bad_points():
    c = secq256k1
    with pytest.raises(ValueError):
        c.deserialize_compressed(b"\x00" * 32)  # wrong length
    # x not on curve: x=1 -> 1 + 7 = 8; is 8 a QR mod p? find a non-point
    for x in range(1, 50):
        if c.get_ys_from_x(x) is None:
            blob = c.fq.to_bytes(x, flags=0, flag_bits=2)
            with pytest.raises(ValueError):
                c.deserialize_compressed(blob)
            break
    else:
        pytest.skip("no small non-curve x found")
