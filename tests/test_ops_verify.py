"""Device-resident R1CS verification (ops/verify.py + device mega-MSM)."""

import pytest

pytestmark = pytest.mark.heavy

from ark_bulletproofs_tpu import engine
from ark_bulletproofs_tpu.curves import secq256k1 as C
from ark_bulletproofs_tpu.errors import R1CSVerificationError
from ark_bulletproofs_tpu.gadgets import ShuffleProof
from ark_bulletproofs_tpu.generators import BulletproofGens, PedersenGens
from ark_bulletproofs_tpu.rand import seeded_rng
from ark_bulletproofs_tpu.transcript.merlin import Transcript

K = 100  # 2(k-1) = 198 multipliers -> padded_n = 256 (device-path gate)


@pytest.fixture(scope="module")
def shuffle_instance():
    pc = PedersenGens.default(C)
    bp = BulletproofGens(C, 256, 1)
    rng = seeded_rng(77)
    vals = [rng.next_u64() for _ in range(K)]
    perm = list(reversed(vals))
    t = Transcript(b"devverify")
    proof, ic, oc = ShuffleProof.prove(rng, pc, bp, t, vals, perm)
    return pc, bp, proof, ic, oc


def test_device_verify_accepts(shuffle_instance, monkeypatch):
    pc, bp, proof, ic, oc = shuffle_instance
    monkeypatch.setattr(engine.config, "backend", "jax")
    proof.verify(pc, bp, Transcript(b"devverify"), ic, oc)


def test_device_verify_rejects_tampered(shuffle_instance, monkeypatch):
    pc, bp, proof, ic, oc = shuffle_instance
    monkeypatch.setattr(engine.config, "backend", "jax")
    with pytest.raises(R1CSVerificationError):
        proof.verify(pc, bp, Transcript(b"devverify"), oc, ic)


def test_device_prover_matches_host(monkeypatch):
    """Same seed -> bit-identical proof on host and device prover paths."""
    pc = PedersenGens.default(C)
    bp = BulletproofGens(C, 256, 1)
    vals = [seeded_rng(5).next_u64() for _ in range(K)]
    perm = list(reversed(vals))

    monkeypatch.setattr(engine.config, "backend", "host")
    ph, ic1, oc1 = ShuffleProof.prove(
        seeded_rng(9), pc, bp, Transcript(b"devprove"), vals, perm
    )
    monkeypatch.setattr(engine.config, "backend", "jax")
    pd, ic2, oc2 = ShuffleProof.prove(
        seeded_rng(9), pc, bp, Transcript(b"devprove"), vals, perm
    )
    monkeypatch.setattr(engine.config, "backend", "host")
    assert ic1 == ic2 and oc1 == oc2
    assert ph.proof.to_bytes(C) == pd.proof.to_bytes(C)


def test_device_batch_verify(shuffle_instance, monkeypatch):
    from ark_bulletproofs_tpu.r1cs import batch_verify

    pc, bp, proof, ic, oc = shuffle_instance
    monkeypatch.setattr(engine.config, "backend", "jax")
    v1 = proof.build_verifier(pc, Transcript(b"devverify"), ic, oc)
    v2 = proof.build_verifier(pc, Transcript(b"devverify"), ic, oc)
    batch_verify(
        seeded_rng(3), [(v1, proof.proof), (v2, proof.proof)], pc, bp
    )
    # a bad instance must fail the whole batch
    v3 = proof.build_verifier(pc, Transcript(b"devverify"), ic, oc)
    v4 = proof.build_verifier(pc, Transcript(b"devverify"), oc, ic)
    with pytest.raises(R1CSVerificationError):
        batch_verify(
            seeded_rng(3), [(v3, proof.proof), (v4, proof.proof)], pc, bp
        )


def test_device_matches_host_scalars(shuffle_instance, monkeypatch):
    """The device g/h vectors must equal the host-assembled ones."""
    import numpy as np

    from ark_bulletproofs_tpu.ops import verify as dverify
    from ark_bulletproofs_tpu.ops.limbs import limbs_to_ints
    from ark_bulletproofs_tpu.r1cs.verifier import next_power_of_two

    pc, bp, proof, ic, oc = shuffle_instance
    monkeypatch.setattr(engine.config, "backend", "host")
    v_host = proof.build_verifier(pc, Transcript(b"devverify"), ic, oc)
    scalars = v_host.verification_scalars(proof.proof, bp)
    padded_n = next_power_of_two(v_host.num_vars)
    g_host = scalars[2: 2 + padded_n]
    h_host = scalars[2 + padded_n: 2 + 2 * padded_n]

    v_dev = proof.build_verifier(pc, Transcript(b"devverify"), ic, oc)
    ing = v_dev._verification_ingredients(proof.proof, bp)
    fr = C.fr
    g_dev, h_dev, delta = dverify.gh_scalars(
        C, padded_n, ing["wL"], ing["wR"], ing["wO"],
        fr.inv(ing["y"]), ing["u"], ing["x"], ing["a"], ing["b"],
        ing["u_sq"], ing["allinv"], ing["n1"],
    )
    assert limbs_to_ints(np.asarray(g_dev)) == g_host
    assert limbs_to_ints(np.asarray(h_dev)) == h_host
