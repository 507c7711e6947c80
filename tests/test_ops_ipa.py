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


def test_sharded_round_fns_match_dynamic():
    """The static-`cur` mesh variants (`_round_scalars_sharded`,
    `_fold_sharded`) must be bit-identical to the dynamic single-chip
    programs for every round size (SURVEY.md §5 sharded length-n)."""
    import random

    import jax.numpy as jnp

    from ark_bulletproofs_tpu.ops import ipa as dipa

    f = secq256k1_fr
    spec = df.spec_for(f)
    rng = random.Random(11)
    N, M = 16, 64
    R = f.R

    def randv():
        return jnp.asarray(
            ints_to_limbs([rng.randrange(f.p) * R % f.p for _ in range(N)])
        )

    a, b, gm, hm = randv(), randv(), randv(), randv()
    one = df.mont_one(spec, ())
    u = jnp.asarray(ints_to_limbs([rng.randrange(f.p) * R % f.p]))[0]
    ui = jnp.asarray(ints_to_limbs([rng.randrange(f.p) * R % f.p]))[0]

    cur = N
    while cur >= 2:
        m, curm1 = jnp.uint32(cur // 2), jnp.uint32(cur - 1)
        want = dipa._round_scalars(spec, a, b, gm, hm, m, curm1, M)
        got = dipa._round_scalars_sharded(spec, a, b, gm, hm, one, cur, M)
        assert np.array_equal(np.asarray(want), np.asarray(got)), cur
        wf = dipa._fold(spec, a, b, gm, hm, u, ui, m, curm1)
        gf = dipa._fold_sharded(spec, a, b, gm, hm, u, ui, cur)
        for w, g in zip(wf, gf):
            assert np.array_equal(np.asarray(w), np.asarray(g)), cur
        a, b, gm, hm = wf
        cur //= 2


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


@pytest.mark.heavy
def test_ipa_batch_matches_host(monkeypatch):
    """create_batch: P lockstep proofs bit-identical to serial creation
    with Q_b = w_b * B (the R1CS shape, prover.rs:777-779)."""
    import random

    n = 32
    P = 3
    G, H, _Q, _a, _b, Gf, Hf, _P = make_instance(n)
    rng = random.Random(44)
    base_B = C.gen
    ws, a_l, b_l, Gf_l, Hf_l = [], [], [], [], []
    for _ in range(P):
        ws.append(rng.randrange(C.fr.p))
        a_l.append([rng.randrange(C.fr.p) for _ in range(n)])
        b_l.append([rng.randrange(C.fr.p) for _ in range(n)])
        Gf_l.append(list(Gf))
        Hf_l.append([rng.randrange(C.fr.p) for _ in range(n)])

    monkeypatch.setattr(engine.config, "backend", "host")
    host_proofs = []
    for bi in range(P):
        t = Transcript(b"ipabatch" + bytes([bi]))
        Qb = C.mul(base_B, ws[bi])
        host_proofs.append(
            InnerProductProof.create(
                t, C, Qb, Gf_l[bi], Hf_l[bi], list(G), list(H),
                a_l[bi], b_l[bi],
            )
        )

    monkeypatch.setattr(engine.config, "backend", "jax")
    ts = [Transcript(b"ipabatch" + bytes([bi])) for bi in range(P)]
    dev_proofs = InnerProductProof.create_batch(
        ts, C, base_B, ws, Gf_l, Hf_l, list(G), list(H), a_l, b_l
    )
    monkeypatch.setattr(engine.config, "backend", "host")

    for hp, dp in zip(host_proofs, dev_proofs):
        assert dp.L_vec == hp.L_vec
        assert dp.R_vec == hp.R_vec
        assert dp.a == hp.a
        assert dp.b == hp.b


@pytest.mark.heavy
def test_ipa_device_shrink_matches_host(monkeypatch):
    """Table shrink (segmented base fold, ops/ipa.py::IpaDeviceProver.
    _shrink): once T = N/cur segments share each live slot the folded
    table is materialized and rounds continue at width cur. Proof bytes
    must be identical to the host prover's (the shrink is exact group
    math). Exercised at a toy threshold so the light suite covers the
    production branch point; ABTPU_IPA_SHRINK_SETS=8 forces the
    bounded-HBM scalar-set chunking (4 slices of the 32-set fold MSM)
    so the slice path is covered too. n=64 rather than 128 keeps the
    XLA:CPU compile cost out of the light-suite budget (ADVICE r3)."""
    from ark_bulletproofs_tpu.ops.ipa import IpaDeviceProver

    n = 64
    G, H, Q, a, b, Gf, Hf, P = make_instance(n, seed=13)

    monkeypatch.setattr(engine.config, "backend", "host")
    t = Transcript(b"ipashrinktest")
    host_proof = InnerProductProof.create(
        t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b)
    )

    shrinks = []
    orig = IpaDeviceProver._shrink

    def spy(self, cur):
        shrinks.append((self.N, cur))
        return orig(self, cur)

    monkeypatch.setattr(IpaDeviceProver, "_shrink", spy)
    monkeypatch.setenv("ABTPU_IPA_SHRINK_T", "4")
    monkeypatch.setenv("ABTPU_IPA_SHRINK_SETS", "8")
    monkeypatch.setattr(engine.config, "backend", "jax")
    t = Transcript(b"ipashrinktest")
    dev_proof = InnerProductProof.create(
        t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b)
    )
    monkeypatch.setattr(engine.config, "backend", "host")

    # shrink fired at cur=16 (T=8), again blocked below cur=16
    assert shrinks == [(n, 16)]
    assert dev_proof.L_vec == host_proof.L_vec
    assert dev_proof.R_vec == host_proof.R_vec
    assert dev_proof.a == host_proof.a
    assert dev_proof.b == host_proof.b

    t = Transcript(b"ipashrinktest")
    dev_proof.verify(n, t, C, Gf, Hf, P, Q, G, H)


@pytest.mark.heavy
def test_ipa_device_te_curve_matches_host(monkeypatch):
    """TE-model (curve25519) device IPA: the compact-round fetch block
    carries 4 extended coords per point, not 3 Jacobian ones — the
    round-4 curve25519 TPU sweep crashed on the hardcoded (6, 16)
    reshape. Bit-exactness vs the host path covers the model-aware
    _host_lr/point_batch_ints plumbing."""
    import random

    from ark_bulletproofs_tpu.curves import curve25519 as C25
    from ark_bulletproofs_tpu.generators import GeneratorsChain
    from ark_bulletproofs_tpu.util import exp_vec

    n = 64
    f = C25.fr
    rng = random.Random(3)
    G = GeneratorsChain(C25, b"te G").take(n)
    H = GeneratorsChain(C25, b"te H").take(n)
    Q = C25.mul(C25.gen, rng.randrange(f.p))
    a = [rng.randrange(f.p) for _ in range(n)]
    b = [rng.randrange(f.p) for _ in range(n)]
    Gf = [1] * n
    Hf = exp_vec(f, rng.randrange(f.p), n)
    monkeypatch.setattr(engine.config, "backend", "host")
    t = Transcript(b"te ipa")
    host = InnerProductProof.create(
        t, C25, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    monkeypatch.setattr(engine.config, "backend", "jax")
    t = Transcript(b"te ipa")
    dev = InnerProductProof.create(
        t, C25, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    assert dev.L_vec == host.L_vec and dev.R_vec == host.R_vec
    assert dev.a == host.a and dev.b == host.b
