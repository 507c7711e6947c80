"""Large-IPA wall-clock: one n=2^16 proof on the device prover
(BASELINE.md row "Large IPA n = 2^16, wall-clock, sharded MSM").

The device prover keeps the witness/weight vectors resident and issues
one fixed-width (2N+1)-term MSM pair per round over the original base
table (see ipp.py's weighted-fold design); on TPU those MSMs route
through the v2 mega-kernel (and across the mesh when one is active).

Usage: python benches/bench_ipa_large.py [log_n=16] [iters=2]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = 1 << log_n

    from ark_bulletproofs_tpu import engine
    from ark_bulletproofs_tpu.curves import secq256k1 as C
    from ark_bulletproofs_tpu.generators import BulletproofGens
    from ark_bulletproofs_tpu.ipp import InnerProductProof
    from ark_bulletproofs_tpu.transcript.merlin import Transcript
    from ark_bulletproofs_tpu.util import exp_vec

    f = C.fr
    rng = random.Random(11)
    t0 = time.time()
    bp = BulletproofGens(C, n, 1)
    G = bp.share(0).G(n)
    H = bp.share(0).H(n)
    print(f"gens ready ({time.time() - t0:.0f}s)", flush=True)

    w = rng.randrange(f.p)
    a = [rng.randrange(f.p) for _ in range(n)]
    b = [rng.randrange(f.p) for _ in range(n)]
    gf = [1] * n
    hf = exp_vec(f, rng.randrange(f.p), n)

    engine.config.backend = "jax"
    Q = C.mul(C.gen, w)

    def run():
        t = Transcript(b"bench ipa large")
        return InnerProductProof.create(
            t, C, Q, list(gf), list(hf), list(G), list(H), list(a), list(b)
        )

    t0 = time.time()
    proof = run()  # compile
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    rec = {
        "metric": f"ipa_prove_n{n}_single",
        "value": round(dt, 3),
        "unit": "s/proof",
        "backend": "jax",
    }
    print(json.dumps(rec))

    # build P = <a, G*gf> + <b, H*hf> + <a,b> Q exactly as the reference
    # test does (inner_product_proof.rs:454-479), then time verification.
    from ark_bulletproofs_tpu.util import inner_product

    scalars = [ai * gi % f.p for ai, gi in zip(a, gf)]
    scalars += [bi * hi % f.p for bi, hi in zip(b, hf)]
    scalars += [inner_product(f, a, b)]
    P = engine.msm(C, list(G) + list(H) + [Q], scalars)

    def run_verify():
        proof.verify(n, Transcript(b"bench ipa large"), C, gf, hf, P, Q,
                     list(G), list(H))

    t0 = time.perf_counter()
    run_verify()  # compile (the ragged mega-MSM chunk shapes are fresh)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        run_verify()
    dt_v = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"ipa_verify_n{n}_single",
        "value": round(dt_v, 3),
        "unit": "s/proof",
        "backend": "jax",
        "cold_s": round(cold, 3),
    }))


if __name__ == "__main__":
    main()
