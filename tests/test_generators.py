"""Generator table behavior (mirrors reference src/generators.rs:306-377)."""

import pytest

from ark_bulletproofs_tpu.curves import curve25519, secq256k1, zorro
from ark_bulletproofs_tpu.generators import (
    BulletproofGens,
    GeneratorsChain,
    PedersenGens,
)


def test_pedersen_default_deterministic():
    pc1 = PedersenGens.default(secq256k1)
    pc2 = PedersenGens.default(secq256k1)
    assert pc1.B == secq256k1.gen
    assert pc1.B_blinding == pc2.B_blinding
    assert pc1.B_blinding != pc1.B
    assert secq256k1.is_on_curve(pc1.B_blinding)


def test_pedersen_commit_homomorphic():
    pc = PedersenGens.default(secq256k1)
    c = secq256k1
    f = c.fr
    C1 = pc.commit(3, 10)
    C2 = pc.commit(4, 20)
    C3 = pc.commit(7, 30)
    assert c.add(C1, C2) == C3
    # commit(0,0) is the identity
    assert c.is_zero(pc.commit(0, 0))
    assert pc.commit(f.p - 1, 0) == c.neg(pc.commit(1, 0))


def test_chain_determinism_and_label_separation():
    g1 = GeneratorsChain(secq256k1, b"G\x00\x00\x00\x00").take(4)
    g2 = GeneratorsChain(secq256k1, b"G\x00\x00\x00\x00").take(4)
    h1 = GeneratorsChain(secq256k1, b"H\x00\x00\x00\x00").take(4)
    assert g1 == g2
    assert g1 != h1
    assert len({secq256k1.serialize_compressed(p) for p in g1 + h1}) == 8


def test_fast_forward_matches_skip():
    full = GeneratorsChain(secq256k1, b"ff").take(10)
    tail = GeneratorsChain(secq256k1, b"ff").fast_forward(6).take(4)
    assert tail == full[6:]


@pytest.mark.parametrize("curve", [secq256k1, zorro, curve25519],
                         ids=lambda c: c.name)
def test_increase_capacity_matches_fresh(curve):
    """Resumability: growing a table equals creating the bigger table
    (reference generators.rs:354-377)."""
    big = BulletproofGens(curve, 16, 2)
    grown = BulletproofGens(curve, 8, 2)
    grown.increase_capacity(16)
    for j in range(2):
        assert big.G_vec[j] == grown.G_vec[j]
        assert big.H_vec[j] == grown.H_vec[j]


def test_aggregated_iter_matches_flat_map():
    """reference generators.rs:311-351."""
    gens = BulletproofGens(secq256k1, 8, 4)
    for n in (8, 4, 2, 1):
        for m in (4, 2, 1):
            agg = gens.G(n, m)
            flat = [g for row in gens.G_vec[:m] for g in row[:n]]
            assert agg == flat
            agg_h = gens.H(n, m)
            flat_h = [h for row in gens.H_vec[:m] for h in row[:n]]
            assert agg_h == flat_h


def test_share_view():
    gens = BulletproofGens(secq256k1, 8, 3)
    sh = gens.share(2)
    assert sh.G(5) == gens.G_vec[2][:5]
    assert sh.H(5) == gens.H_vec[2][:5]


def test_save_load_roundtrip(tmp_path):
    gens = BulletproofGens(secq256k1, 8, 2)
    path = str(tmp_path / "gens.json")
    gens.save(path)
    loaded = BulletproofGens.load(path, secq256k1)
    assert loaded.G_vec == gens.G_vec
    assert loaded.H_vec == gens.H_vec
    assert loaded.gens_capacity == 8
