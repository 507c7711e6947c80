"""Device-resident IPA prover vs the exact host prover.

The device path must produce bit-identical proofs (same transcript ops,
same L/R points, same final a/b) as the host path for the same inputs.
"""

import numpy as np
import pytest

from ark_bulletproofs_tpu import engine
from ark_bulletproofs_tpu.curves import secq256k1 as C
from ark_bulletproofs_tpu.fields import secq256k1_fr
from ark_bulletproofs_tpu.ipp import InnerProductProof
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs, limbs_to_int
from ark_bulletproofs_tpu.transcript.merlin import Transcript

from test_ipp import make_instance


def test_sum_dot_mod():
    import random

    f = secq256k1_fr
    spec = df.spec_for(f)
    rng = random.Random(3)
    n = 1000
    xs = [rng.randrange(f.p) for _ in range(n)]
    ys = [rng.randrange(f.p) for _ in range(n)]
    R = f.R
    a = ints_to_limbs([x * R % f.p for x in xs])
    b = ints_to_limbs([y * R % f.p for y in ys])
    s = np.asarray(df.sum_mod(spec, np.asarray(a)))
    assert limbs_to_int(s) == sum(xs) % f.p * R % f.p
    d = np.asarray(df.dot_mod(spec, np.asarray(a), np.asarray(b)))
    want = sum(x * y for x, y in zip(xs, ys)) % f.p
    assert limbs_to_int(d) == want * R % f.p


@pytest.mark.heavy
def test_ipa_device_matches_host(monkeypatch):
    n = 64
    G, H, Q, a, b, Gf, Hf, P = make_instance(n)

    monkeypatch.setattr(engine.config, "backend", "host")
    t = Transcript(b"ipadevtest")
    host_proof = InnerProductProof.create(
        t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b)
    )

    monkeypatch.setattr(engine.config, "backend", "jax")
    t = Transcript(b"ipadevtest")
    dev_proof = InnerProductProof.create(
        t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b)
    )
    monkeypatch.setattr(engine.config, "backend", "host")

    assert dev_proof.L_vec == host_proof.L_vec
    assert dev_proof.R_vec == host_proof.R_vec
    assert dev_proof.a == host_proof.a
    assert dev_proof.b == host_proof.b

    # and the device-produced proof verifies
    t = Transcript(b"ipadevtest")
    dev_proof.verify(n, t, C, Gf, Hf, P, Q, G, H)
