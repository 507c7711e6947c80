"""Inner-product argument tests (mirrors reference
src/inner_product_proof.rs:411-553 across n in {1,2,4,32,64})."""

import pytest

from ark_bulletproofs_tpu.curves import secq256k1 as C
from ark_bulletproofs_tpu.errors import VerificationError
from ark_bulletproofs_tpu.generators import BulletproofGens
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.hashes.keccak import sha3_512
from ark_bulletproofs_tpu.ipp import InnerProductProof
from ark_bulletproofs_tpu.rand import seeded_rng
from ark_bulletproofs_tpu.transcript.merlin import Transcript
from ark_bulletproofs_tpu.util import exp_vec, inner_product


def make_instance(n, seed=7):
    bp = BulletproofGens(C, n, 1)
    G = bp.share(0).G(n)
    H = bp.share(0).H(n)
    Q = C.rand(ChaChaRng(sha3_512(b"test point")[:32]))
    rng = seeded_rng(seed)
    f = C.fr
    a = [f.rand(rng) for _ in range(n)]
    b = [f.rand(rng) for _ in range(n)]
    c = inner_product(f, a, b)
    y_inv = f.rand(rng)
    G_factors = [1] * n
    H_factors = exp_vec(f, y_inv, n)
    b_prime = [bi * yi % f.p for bi, yi in zip(b, H_factors)]
    P = C.msm(G + H + [Q], a + b_prime + [c])
    return G, H, Q, a, b, G_factors, H_factors, P


@pytest.mark.parametrize("n", [1, 2, 4, 32, 64])
def test_ipp_roundtrip(n):
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    assert len(proof.L_vec) == n.bit_length() - 1

    t = Transcript(b"innerproducttest")
    proof.verify(n, t, C, Gf, Hf, P, Q, G, H)

    # serialization roundtrip (reference inner_product_proof.rs:507-527)
    blob = proof.to_bytes(C)
    proof2, consumed = InnerProductProof.from_bytes(C, blob)
    assert consumed == len(blob)
    t = Transcript(b"innerproducttest")
    proof2.verify(n, t, C, Gf, Hf, P, Q, G, H)


def test_ipp_rejects_wrong_P():
    n = 4
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    bad_P = C.add(P, C.gen)
    t = Transcript(b"innerproducttest")
    with pytest.raises(VerificationError):
        proof.verify(n, t, C, Gf, Hf, bad_P, Q, G, H)


def test_ipp_rejects_wrong_transcript():
    n = 4
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    t = Transcript(b"a different protocol")
    with pytest.raises(VerificationError):
        proof.verify(n, t, C, Gf, Hf, P, Q, G, H)


def test_ipp_rejects_wrong_length():
    n = 4
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    t = Transcript(b"innerproducttest")
    with pytest.raises(VerificationError):
        proof.verification_scalars(8, t, C)


def test_verification_scalars_structure():
    n = 8
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)
    t = Transcript(b"innerproducttest")
    proof = InnerProductProof.create(t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    t = Transcript(b"innerproducttest")
    u_sq, u_inv_sq, s = proof.verification_scalars(n, t, C)
    p = C.fr.p
    assert len(u_sq) == len(u_inv_sq) == 3
    assert len(s) == n
    for usq, uisq in zip(u_sq, u_inv_sq):
        assert usq * uisq % p == 1
    # s[i] * s[n-1-i] == 1 (s is the challenge-product vector)
    for i in range(n):
        assert s[i] * s[n - 1 - i] % p == 1


def test_inner_product_value():
    f = C.fr
    assert inner_product(f, [1, 2, 3, 4], [2, 3, 4, 5]) == 40
