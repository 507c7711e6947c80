"""IPA proofs/s: cross-proof batched prover (BASELINE.md north-star
"IPA prove+verify proofs/s", workload from the reference's IPA tests,
inner_product_proof.rs:530-553, n = 64).

Creates P proofs of length n in lockstep via
InnerProductProof.create_batch (one batched-scalar-set MSM per round,
transcript syncs amortized over the batch) and prints one JSON line
with proofs/s. Run on TPU:  python benches/bench_ipa_batch.py [P] [n]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax  # noqa: F401

    from ark_bulletproofs_tpu import engine
    from ark_bulletproofs_tpu.curves import secq256k1 as C
    from ark_bulletproofs_tpu.generators import BulletproofGens
    from ark_bulletproofs_tpu.ipp import InnerProductProof
    from ark_bulletproofs_tpu.transcript.merlin import Transcript
    from ark_bulletproofs_tpu.util import exp_vec

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    bp = BulletproofGens(C, n, 1)
    G = bp.share(0).G(n)
    H = bp.share(0).H(n)
    rng = random.Random(9)
    f = C.fr

    def make(P):
        ws, a_l, b_l, gf_l, hf_l = [], [], [], [], []
        for _ in range(P):
            ws.append(rng.randrange(f.p))
            a_l.append([rng.randrange(f.p) for _ in range(n)])
            b_l.append([rng.randrange(f.p) for _ in range(n)])
            gf_l.append([1] * n)
            hf_l.append(exp_vec(f, rng.randrange(f.p), n))
        return ws, a_l, b_l, gf_l, hf_l

    engine.config.backend = "jax"
    ws, a_l, b_l, gf_l, hf_l = make(P)

    def run():
        ts = [Transcript(b"bench ipa" + bytes([i & 255])) for i in range(P)]
        return InnerProductProof.create_batch(
            ts, C, C.gen, ws, gf_l, hf_l, list(G), list(H), a_l, b_l
        )

    proofs = run()  # compile

    # spot-check one proof against the host path
    engine.config.backend = "host"
    t = Transcript(b"bench ipa" + bytes([0]))
    hp = InnerProductProof.create(
        t, C, C.mul(C.gen, ws[0]), gf_l[0], hf_l[0],
        list(G), list(H), a_l[0], b_l[0],
    )
    assert proofs[0].L_vec == hp.L_vec and proofs[0].a == hp.a, "mismatch"
    engine.config.backend = "jax"

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": f"ipa_prove_n{n}_batch{P}",
                "value": round(P / dt, 2),
                "unit": "proofs/s",
            }
        )
    )

    # Verification: one (2n + 2 lg n + 1)-term MSM per proof (reference
    # inner_product_proof.rs:321-382). At n=64 that is a 141-term MSM —
    # below any device crossover — so the honest configuration is the
    # exact host path; report it as the verify half of the north star.
    engine.config.backend = "host"
    from ark_bulletproofs_tpu.util import inner_product

    Ps = []
    for i in range(P):
        sc = [ai * gi % f.p for ai, gi in zip(a_l[i], gf_l[i])]
        sc += [bi * hi % f.p for bi, hi in zip(b_l[i], hf_l[i])]
        sc += [inner_product(f, a_l[i], b_l[i]) * ws[i] % f.p]
        Ps.append(
            engine.msm(C, list(G) + list(H) + [C.gen], sc)
        )
    t0 = time.perf_counter()
    for i in range(P):
        t = Transcript(b"bench ipa" + bytes([i & 255]))
        proofs[i].verify(n, t, C, gf_l[i], hf_l[i], Ps[i],
                         C.mul(C.gen, ws[i]), list(G), list(H))
    dt_v = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"ipa_verify_n{n}_batch{P}",
                "value": round(P / dt_v, 2),
                "unit": "proofs/s",
                "backend": "host",
            }
        )
    )


if __name__ == "__main__":
    main()
