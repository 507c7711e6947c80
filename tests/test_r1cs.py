"""R1CS integration tests across all three curves (mirrors the reference's
tests/r1cs_secq256k1.rs, r1cs_zorro.rs, r1cs_curve25519.rs suites)."""

import random

import pytest

from ark_bulletproofs_tpu.curves import curve25519, secq256k1, zorro
from ark_bulletproofs_tpu.errors import R1CSError
from ark_bulletproofs_tpu.gadgets import (
    ShuffleProof,
    example_gadget,
    range_proof_gadget,
)
from ark_bulletproofs_tpu.generators import BulletproofGens, PedersenGens
from ark_bulletproofs_tpu.r1cs import (
    LinearCombination,
    Prover,
    R1CSProof,
    Verifier,
    batch_verify,
)
from ark_bulletproofs_tpu.rand import seeded_rng
from ark_bulletproofs_tpu.transcript.merlin import Transcript
from ark_bulletproofs_tpu.util import next_power_of_two

CURVES = [secq256k1, zorro, curve25519]


# --- k-shuffle -------------------------------------------------------------


def kshuffle_roundtrip(curve, k, seed):
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, next_power_of_two(2 * k), 1)
    rng = seeded_rng(seed)
    pyrng = random.Random(seed)

    inputs = [pyrng.getrandbits(64) for _ in range(k)]
    outputs = list(inputs)
    pyrng.shuffle(outputs)

    t = Transcript(b"ShuffleProofTest")
    proof, in_coms, out_coms = ShuffleProof.prove(
        rng, pc_gens, bp_gens, t, inputs, outputs
    )
    t = Transcript(b"ShuffleProofTest")
    proof.verify(pc_gens, bp_gens, t, in_coms, out_coms)
    return proof, in_coms, out_coms, pc_gens, bp_gens


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6, 7, 24, 42])
def test_shuffle_secq256k1(k):
    """k sweep mirrors reference tests/r1cs_secq256k1.rs:172-215
    (k in {1..7, 24, 42})."""
    kshuffle_roundtrip(secq256k1, k, 1000 + k)


@pytest.mark.parametrize("k", [1, 2, 5])
def test_shuffle_zorro(k):
    kshuffle_roundtrip(zorro, k, 2000 + k)


@pytest.mark.parametrize("k", [1, 2, 5])
def test_shuffle_curve25519(k):
    kshuffle_roundtrip(curve25519, k, 3000 + k)


def test_shuffle_rejects_non_permutation():
    curve = secq256k1
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 16, 1)
    rng = seeded_rng(77)
    inputs = [1, 2, 3]
    outputs = [1, 2, 4]  # not a permutation
    t = Transcript(b"ShuffleProofTest")
    proof, in_coms, out_coms = ShuffleProof.prove(
        rng, pc_gens, bp_gens, t, inputs, outputs
    )
    t = Transcript(b"ShuffleProofTest")
    with pytest.raises(R1CSError):
        proof.verify(pc_gens, bp_gens, t, in_coms, out_coms)


# --- example gadget ---------------------------------------------------------


def example_gadget_proof(curve, pc_gens, bp_gens, a1, a2, b1, b2, c1, c2, seed=5):
    t = Transcript(b"R1CSExampleGadget")
    rng = seeded_rng(seed)
    prover = Prover(pc_gens, t)
    pairs = [prover.commit(x, curve.fr.rand(rng)) for x in (a1, a2, b1, b2, c1)]
    coms = [p[0] for p in pairs]
    v = [p[1] for p in pairs]
    example_gadget(
        prover, v[0].lc(), v[1].lc(), v[2].lc(), v[3].lc(), v[4].lc(),
        LinearCombination.from_value(curve.fr, c2),
    )
    proof = prover.prove(rng, bp_gens)
    return proof, coms


def example_gadget_verify(curve, pc_gens, bp_gens, c2, proof, coms):
    t = Transcript(b"R1CSExampleGadget")
    verifier = Verifier(curve, t)
    v = [verifier.commit(V) for V in coms]
    example_gadget(
        verifier, v[0].lc(), v[1].lc(), v[2].lc(), v[3].lc(), v[4].lc(),
        LinearCombination.from_value(curve.fr, c2),
    )
    verifier.verify(proof, pc_gens, bp_gens)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_example_gadget(curve):
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 128, 1)
    # (3 + 4) * (6 + 1) = (40 + 9)
    proof, coms = example_gadget_proof(curve, pc_gens, bp_gens, 3, 4, 6, 1, 40, 9)
    example_gadget_verify(curve, pc_gens, bp_gens, 9, proof, coms)
    # (3 + 4) * (6 + 1) != (40 + 10)
    proof, coms = example_gadget_proof(curve, pc_gens, bp_gens, 3, 4, 6, 1, 40, 10)
    with pytest.raises(R1CSError):
        example_gadget_verify(curve, pc_gens, bp_gens, 10, proof, coms)


def test_example_gadget_serialization():
    curve = secq256k1
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 128, 1)
    proof, coms = example_gadget_proof(curve, pc_gens, bp_gens, 3, 4, 6, 1, 40, 9)
    blob = proof.to_bytes(curve)
    proof2 = R1CSProof.from_bytes(curve, blob)
    example_gadget_verify(curve, pc_gens, bp_gens, 9, proof2, coms)
    assert proof2.to_bytes(curve) == blob


# --- range proof -------------------------------------------------------------


def range_proof_roundtrip(curve, v_val, n, seed=9):
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 128, 1)
    rng = seeded_rng(seed)
    t = Transcript(b"RangeProofTest")
    prover = Prover(pc_gens, t)
    com, var = prover.commit(v_val, curve.fr.rand(rng))
    range_proof_gadget(prover, curve, var.lc(), v_val, n)
    proof = prover.prove(rng, bp_gens)

    t = Transcript(b"RangeProofTest")
    verifier = Verifier(curve, t)
    var = verifier.commit(com)
    range_proof_gadget(verifier, curve, var.lc(), None, n)
    verifier.verify(proof, pc_gens, bp_gens)


@pytest.mark.parametrize("n", [2, 10, 32, 63])
def test_range_proof(n):
    pyrng = random.Random(400 + n)
    v = pyrng.randrange(0, (1 << n) - 1)
    range_proof_roundtrip(secq256k1, v, n)
    with pytest.raises(R1CSError):
        range_proof_roundtrip(secq256k1, 1 << n, n)


# --- batch verification --------------------------------------------------------


def _make_range_instance(curve, pc_gens, bp_gens, v, n, seed):
    rng = seeded_rng(seed)
    t = Transcript(b"RangeProofTest")
    prover = Prover(pc_gens, t)
    com, var = prover.commit(v, curve.fr.rand(rng))
    range_proof_gadget(prover, curve, var.lc(), v, n)
    proof = prover.prove(rng, bp_gens)

    t = Transcript(b"RangeProofTest")
    verifier = Verifier(curve, t)
    var = verifier.commit(com)
    range_proof_gadget(verifier, curve, var.lc(), None, n)
    return verifier, proof


def _batch_range(curve, values, seed=123):
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 128, 1)
    instances = [
        _make_range_instance(curve, pc_gens, bp_gens, v, n, seed + i)
        for i, (v, n) in enumerate(values)
    ]
    batch_verify(seeded_rng(seed), instances, pc_gens, bp_gens)


def test_batch_verify_all_valid():
    """Mixed sizes must pass (reference tests/r1cs_secq256k1.rs:447-465)."""
    _batch_range(secq256k1, [(0, 16)])
    _batch_range(secq256k1, [(0, 16), (3, 16), ((1 << 16) - 1, 16), (1 << 16, 32)])


def test_batch_verify_any_invalid_fails():
    with pytest.raises(R1CSError):
        _batch_range(secq256k1, [(0, 16), (3, 16), (1 << 16, 16), (1 << 16, 32)])
    with pytest.raises(R1CSError):
        _batch_range(
            secq256k1,
            [(0, 16), (3, 16), ((1 << 16) - 1, 16), (1 << 32, 32), (1 << 63, 64)],
        )


# --- misc protocol edges --------------------------------------------------------


def test_gens_capacity_too_small():
    from ark_bulletproofs_tpu.errors import R1CSInvalidGeneratorsLength

    curve = secq256k1
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 2, 1)  # too small for 8 multipliers
    rng = seeded_rng(4)
    t = Transcript(b"capacity")
    prover = Prover(pc_gens, t)
    com, var = prover.commit(5, curve.fr.rand(rng))
    range_proof_gadget(prover, curve, var.lc(), 5, 8)
    with pytest.raises(R1CSInvalidGeneratorsLength):
        prover.prove(rng, bp_gens)


def test_allocate_pairing():
    """allocate() pairs consecutive calls into one multiplier
    (reference prover.rs:135-157)."""
    curve = secq256k1
    pc_gens = PedersenGens.default(curve)
    t = Transcript(b"alloc")
    prover = Prover(pc_gens, t)
    v1 = prover.allocate(3)
    v2 = prover.allocate(5)
    v3 = prover.allocate(7)
    assert prover.multipliers_len() == 2
    assert v1.index == v2.index == 0
    assert v3.index == 1
    assert prover.a_O[0] == 15


def test_proof_from_bytes_rejects_garbage():
    from ark_bulletproofs_tpu.errors import R1CSFormatError

    with pytest.raises(R1CSFormatError):
        R1CSProof.from_bytes(secq256k1, b"\x01" * 100)


# --- batched prover --------------------------------------------------------


def test_prove_batch_matches_serial():
    """prove_batch produces proofs bit-identical to serial Prover.prove
    for the same transcripts/witness/prng seeds (lockstep phases +
    batched MSMs must not change any byte)."""
    from ark_bulletproofs_tpu.r1cs import prove_batch

    curve = secq256k1
    k = 4
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, next_power_of_two(2 * k), 1)

    def build(seed):
        rng = seeded_rng(seed)
        pyrng = random.Random(seed)
        inputs = [pyrng.getrandbits(64) for _ in range(k)]
        outputs = list(inputs)
        pyrng.shuffle(outputs)
        t = Transcript(b"batchprove")
        t.append_message(b"dom-sep", b"ShuffleProof")
        t.append_u64(b"k", k)
        prover = Prover(pc_gens, t)
        in_coms, in_vars = zip(
            *[prover.commit(v, curve.fr.rand(rng)) for v in inputs]
        )
        out_coms, out_vars = zip(
            *[prover.commit(v, curve.fr.rand(rng)) for v in outputs]
        )
        from ark_bulletproofs_tpu.gadgets import shuffle_gadget

        shuffle_gadget(prover, curve, list(in_vars), list(out_vars))
        return prover, rng

    serial = []
    for seed in (301, 302, 303):
        prover, rng = build(seed)
        serial.append(prover.prove(rng, bp_gens))

    provers, rngs = [], []
    for seed in (301, 302, 303):
        prover, rng = build(seed)
        provers.append(prover)
        rngs.append(rng)
    batched = prove_batch(provers, rngs, bp_gens)

    for sp, bp in zip(serial, batched):
        assert sp.to_bytes(curve) == bp.to_bytes(curve)
