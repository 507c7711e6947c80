"""Whole-batch on-chip Fiat-Shamir prover vs the per-round lockstep
prover: bit-equality of proofs AND final transcript states.

The batch FS path (ops/ipa.py::ipa_prove_fs_batch) runs all P lockstep
proofs' rounds — batched compact MSM, vectorized STROBE/Merlin/ChaCha
byte layer with shared sponge positions, fold — as one device program;
the per-round IpaBatchProver with host Fiat-Shamir is the oracle.
Reference: src/inner_product_proof.rs:164-231 (round structure),
src/r1cs/prover.rs:777-779 (the Q_b = w_b * B batching shape).

Marked heavy: the XLA:CPU compile of the fori round program dominates
(~minutes); run with `pytest tests/ -m heavy -n 8 --dist loadscope`.
"""

import os
import random

import pytest

pytestmark = pytest.mark.heavy

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ipp import InnerProductProof
from ark_bulletproofs_tpu.transcript.merlin import Transcript


def _workload(curve, n, P, seed=3):
    fr = curve.fr
    prng = random.Random(seed)
    rng = ChaChaRng(bytes([7]) + bytes(31))
    G_vec = [curve.rand(rng) for _ in range(n)]
    H_vec = [curve.rand(rng) for _ in range(n)]
    base_B = curve.rand(rng)
    ws = [prng.randrange(fr.p) for _ in range(P)]
    Gf = [[prng.randrange(fr.p) for _ in range(n)] for _ in range(P)]
    Hf = [[prng.randrange(fr.p) for _ in range(n)] for _ in range(P)]
    al = [[prng.randrange(fr.p) for _ in range(n)] for _ in range(P)]
    bl = [[prng.randrange(fr.p) for _ in range(n)] for _ in range(P)]
    return base_B, ws, Gf, Hf, G_vec, H_vec, al, bl


def _run(curve, w, fs: str):
    base_B, ws, Gf, Hf, G_vec, H_vec, al, bl = w
    os.environ["ABTPU_IPA_FS"] = fs
    os.environ["ABTPU_BACKEND"] = "jax"
    try:
        ts = [Transcript(b"fsbatch") for _ in range(len(ws))]
        proofs = InnerProductProof.create_batch(
            ts, curve, base_B, ws, Gf, Hf, G_vec, H_vec,
            [list(a) for a in al], [list(b) for b in bl],
        )
    finally:
        del os.environ["ABTPU_IPA_FS"]
        del os.environ["ABTPU_BACKEND"]
    return proofs, ts


def test_fs_batch_bit_equals_lockstep():
    curve = curves.secq256k1
    w = _workload(curve, 64, 3)
    p1, t1 = _run(curve, w, "1")
    p0, t0 = _run(curve, w, "0")
    for a, b in zip(p1, p0):
        assert a.L_vec == b.L_vec and a.R_vec == b.R_vec
        assert a.a == b.a and a.b == b.b
    for x, y in zip(t1, t0):
        assert bytes(x._strobe.state) == bytes(y._strobe.state)
        assert x._strobe.pos == y._strobe.pos
        assert x._strobe.pos_begin == y._strobe.pos_begin
