"""Shared computation for the frozen golden vectors (tests/golden/).

SURVEY.md §4: what must be bit-stable for arkworks-0.4 compatibility is
(a) every generator value for a given label (SHA3-512 -> ChaCha20 ->
UniformRand chain, reference src/generators.rs:78-101), (b) the full
challenge sequence for a given transcript history (src/transcript.rs:
95-101), and (c) canonical proof bytes (src/r1cs/proof.rs:74-91).
The Rust reference cannot run in this image (no cargo/rustc), so these
vectors are *frozen self-goldens*: generated once from the validated
host stack and committed, so any future regression in the byte layer,
sampling, transcript, or protocol ordering is caught bit-exactly.

`compute_golden()` is used both by tools/gen_golden.py (to emit the
fixture) and tests/test_golden.py (to compare against it).
"""

import random

from ark_bulletproofs_tpu.curves import curve25519, secq256k1, zorro
from ark_bulletproofs_tpu.gadgets import (
    ShuffleProof,
    example_gadget,
    range_proof_gadget,
)
from ark_bulletproofs_tpu.generators import (
    BulletproofGens,
    GeneratorsChain,
    PedersenGens,
)
from ark_bulletproofs_tpu.ipp import InnerProductProof
from ark_bulletproofs_tpu.r1cs import Prover
from ark_bulletproofs_tpu.rand import seeded_rng
from ark_bulletproofs_tpu.transcript import protocol
from ark_bulletproofs_tpu.transcript.merlin import Transcript

CURVES = {"secq256k1": secq256k1, "zorro": zorro, "curve25519": curve25519}


def _hex(b: bytes) -> str:
    return b.hex()


def _pt(curve, P) -> str:
    return _hex(curve.serialize_compressed(P))


def _gen_layer(curve) -> dict:
    pc = PedersenGens.default(curve)
    chain_g = GeneratorsChain(curve, b"G" + (0).to_bytes(4, "little"))
    chain_h = GeneratorsChain(curve, b"H" + (0).to_bytes(4, "little"))
    return {
        "pedersen_B": _pt(curve, pc.B),
        "pedersen_B_blinding": _pt(curve, pc.B_blinding),
        "chain_G0_first4": [_pt(curve, p) for p in chain_g.take(4)],
        "chain_H0_first2": [_pt(curve, p) for p in chain_h.take(2)],
    }


def _transcript_layer(curve) -> dict:
    """Challenge sequence for a fixed transcript history (locks Merlin/
    STROBE byte framing + ChaCha + F::rand all the way through)."""
    t = Transcript(b"golden")
    protocol.r1cs_domain_sep(t)
    t.append_message(b"msg", b"arkworks-parity")
    t.append_u64(b"n", 42)
    c1 = protocol.challenge_scalar(t, curve, b"c1")
    protocol.append_scalar(t, curve, b"s", c1)
    c2 = protocol.challenge_scalar(t, curve, b"c2")
    protocol.append_point(t, curve, b"P", curve.gen)
    c3 = protocol.challenge_scalar(t, curve, b"c3")
    return {"challenges": [hex(c1), hex(c2), hex(c3)]}


def _shuffle_layer(curve, seed: int) -> dict:
    k = 3
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 8, 1)
    rng = seeded_rng(seed)
    pyrng = random.Random(seed)
    inputs = [pyrng.getrandbits(64) for _ in range(k)]
    outputs = list(inputs)
    pyrng.shuffle(outputs)
    t = Transcript(b"ShuffleProofGolden")
    sp, in_coms, out_coms = ShuffleProof.prove(
        rng, pc_gens, bp_gens, t, inputs, outputs
    )
    # sanity: the frozen proof must verify
    tv = Transcript(b"ShuffleProofGolden")
    sp.verify(pc_gens, bp_gens, tv, in_coms, out_coms)
    return {
        "inputs": inputs,
        "proof": _hex(sp.proof.to_bytes(curve)),
        "in_coms": [_pt(curve, P) for P in in_coms],
        "out_coms": [_pt(curve, P) for P in out_coms],
    }


def _example_layer(curve, seed: int) -> dict:
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 8, 1)
    rng = seeded_rng(seed)
    vals = [3, 4, 6, 1, 40, 9]
    t = Transcript(b"ExampleGolden")
    prover = Prover(pc_gens, t)
    coms, vars_ = zip(
        *[prover.commit(v, curve.fr.rand(rng)) for v in vals]
    )
    example_gadget(prover, *vars_)
    proof = prover.prove(rng, bp_gens)
    return {
        "proof": _hex(proof.to_bytes(curve)),
        "coms": [_pt(curve, P) for P in coms],
    }


def _range_layer(curve, seed: int) -> dict:
    n = 10
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, 16, 1)
    rng = seeded_rng(seed)
    t = Transcript(b"RangeGolden")
    prover = Prover(pc_gens, t)
    com, var = prover.commit(777, curve.fr.rand(rng))
    range_proof_gadget(prover, curve, var, 777, n)
    proof = prover.prove(rng, bp_gens)
    return {"proof": _hex(proof.to_bytes(curve)), "com": _pt(curve, com)}


def _ipa_layer(curve, seed: int) -> dict:
    n = 32
    f = curve.fr
    rng = seeded_rng(seed)
    bp = BulletproofGens(curve, n, 1)
    G = bp.G(n, 1)
    H = bp.H(n, 1)
    Q = curve.mul(curve.gen, 7)
    a = [f.rand(rng) for _ in range(n)]
    b = [f.rand(rng) for _ in range(n)]
    ones = [1] * n
    t = Transcript(b"IPAGolden")
    proof = InnerProductProof.create(t, curve, Q, ones, ones, G, H, a, b)
    return {"proof": _hex(proof.to_bytes(curve))}


def compute_golden() -> dict:
    out = {}
    for i, (name, curve) in enumerate(CURVES.items()):
        out[name] = {
            "generators": _gen_layer(curve),
            "transcript": _transcript_layer(curve),
            "shuffle_k3": _shuffle_layer(curve, 100 + i),
        }
    # protocol-variant layers on the flagship curve only (cost control)
    out["secq256k1"]["example_gadget"] = _example_layer(secq256k1, 7)
    out["secq256k1"]["range_n10"] = _range_layer(secq256k1, 8)
    out["secq256k1"]["ipa_n32"] = _ipa_layer(secq256k1, 9)
    return out
