"""k-shuffle prove/verify benchmark (reference parity).

Mirrors the reference criterion benches (benches/r1cs_secq256k1.rs:152-261
and benches/r1cs_zorro.rs): proof creation and verification for
k in {2, 4, ..., 1024} (about 2k multipliers). One JSON line per
measurement.

Usage: python benches/bench_shuffle.py [--curve secq256k1] [--kmax 1024]
       [--backend auto|host|jax]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from ark_bulletproofs_tpu import (  # noqa: E402
    BulletproofGens, PedersenGens, Transcript, curves, engine,
)
from ark_bulletproofs_tpu.gadgets import ShuffleProof  # noqa: E402
from ark_bulletproofs_tpu.rand import seeded_rng  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="secq256k1")
    ap.add_argument("--kmax", type=int, default=1024)
    ap.add_argument("--only", type=int, default=0,
                    help="measure a single k (skips the sweep)")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    engine.config.backend = args.backend
    curve = curves.ALL_CURVES[args.curve]
    pc = PedersenGens.default(curve)

    k = args.only or 2
    if args.only:
        args.kmax = args.only
    while k <= args.kmax:
        bp = BulletproofGens(curve, 2 * k, 1)
        rng = seeded_rng(k)
        vals = [rng.next_u64() for _ in range(k)]
        perm = list(reversed(vals))

        # warm (compiles on the device path)
        proof, ic, oc = ShuffleProof.prove(
            rng, pc, bp, Transcript(b"bench"), vals, perm
        )
        proof.verify(pc, bp, Transcript(b"bench"), ic, oc)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            proof, ic, oc = ShuffleProof.prove(
                rng, pc, bp, Transcript(b"bench"), vals, perm
            )
        dt_p = (time.perf_counter() - t0) / args.iters

        t0 = time.perf_counter()
        for _ in range(args.iters):
            proof.verify(pc, bp, Transcript(b"bench"), ic, oc)
        dt_v = (time.perf_counter() - t0) / args.iters

        for op, dt in (("prove", dt_p), ("verify", dt_v)):
            print(
                json.dumps(
                    {
                        "metric": f"shuffle_{op}_{args.curve}_k{k}",
                        "value": round(dt * 1e3, 2),
                        "unit": "ms",
                    }
                ),
                flush=True,
            )
        k *= 2


if __name__ == "__main__":
    main()
