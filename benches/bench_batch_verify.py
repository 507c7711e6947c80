"""Batch verification throughput (reference verifier.rs:604-691 at
scale): N proofs -> ONE mega-MSM, timed end to end.

The BASELINE.md workload is a 1024-proof batch. Proofs (k-shuffle) are
created once on the exact host path and cached on disk; the timed region
is `batch_verify` (transcript replay + device scalar pipelines + the
single mega-MSM, mesh-sharded when ABTPU_MESH=auto and >1 device).

Usage: python benches/bench_batch_verify.py [--n 1024] [--k 8]
Prints one JSON line with proofs/s.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--curve", default="secq256k1")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from ark_bulletproofs_tpu import curves, engine
    from ark_bulletproofs_tpu.gadgets import ShuffleProof
    from ark_bulletproofs_tpu.generators import BulletproofGens, PedersenGens
    from ark_bulletproofs_tpu.r1cs import R1CSProof, batch_verify
    from ark_bulletproofs_tpu.rand import seeded_rng
    from ark_bulletproofs_tpu.transcript.merlin import Transcript

    curve = curves.ALL_CURVES[args.curve]
    pc_gens = PedersenGens.default(curve)
    bp_gens = BulletproofGens(curve, max(2 * args.k, 16), 1)

    cache = os.path.join(
        os.path.dirname(__file__),
        f".cache_batch_{args.curve}_k{args.k}_n{args.n}.pkl",
    )
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            blobs = pickle.load(fh)
    else:
        engine.config.backend = "host"
        blobs = []
        for i in range(args.n):
            rng = seeded_rng(i)
            pyrng = random.Random(i)
            vals = [pyrng.getrandbits(64) for _ in range(args.k)]
            perm = list(vals)
            pyrng.shuffle(perm)
            t = Transcript(b"bench batch")
            sp, ic, oc = ShuffleProof.prove(
                rng, pc_gens, bp_gens, t, vals, perm
            )
            blobs.append(
                (
                    sp.proof.to_bytes(curve),
                    [curve.serialize_compressed(P) for P in ic],
                    [curve.serialize_compressed(P) for P in oc],
                )
            )
            if (i + 1) % 64 == 0:
                print(f"# proved {i + 1}/{args.n}", file=sys.stderr)
        with open(cache, "wb") as fh:
            pickle.dump(blobs, fh)

    engine.config.backend = "auto"

    def build_instances():
        instances = []
        for pb, icb, ocb in blobs:
            proof = R1CSProof.from_bytes(curve, pb)
            ic = [curve.deserialize_compressed(b) for b in icb]
            oc = [curve.deserialize_compressed(b) for b in ocb]
            t = Transcript(b"bench batch")
            dummy = ShuffleProof(proof)
            v = dummy.build_verifier(pc_gens, t, ic, oc)
            instances.append((v, proof))
        return instances

    # timed: full verification incl. transcript replay + mega-MSM
    times = []
    for it in range(args.iters + 1):
        instances = build_instances()
        t0 = time.perf_counter()
        batch_verify(seeded_rng(1000 + it), instances, pc_gens, bp_gens)
        dt = time.perf_counter() - t0
        if it > 0:  # first run pays XLA compiles
            times.append(dt)
    dt = min(times)
    print(
        json.dumps(
            {
                "metric": f"batch_verify_{args.curve}_k{args.k}_n{args.n}",
                "value": round(args.n / dt, 2),
                "unit": "proofs/s",
                "batch_seconds": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
