"""Generator-table benchmark (reference parity).

Mirrors reference benches/generators.rs:10-22: PedersenGens::new and
BulletproofGens::new(size, 1) for size in {2, 4, ..., 1024} (extended
up to --max for the device farm). One JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from ark_bulletproofs_tpu import BulletproofGens, PedersenGens, curves, engine  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="secq256k1")
    ap.add_argument("--max", type=int, default=1024)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    engine.config.backend = args.backend
    curve = curves.ALL_CURVES[args.curve]

    t0 = time.perf_counter()
    PedersenGens.default(curve)
    print(
        json.dumps(
            {
                "metric": f"pedersen_gens_new_{args.curve}",
                "value": round((time.perf_counter() - t0) * 1e3, 2),
                "unit": "ms",
            }
        ),
        flush=True,
    )

    size = 2
    while size <= args.max:
        t0 = time.perf_counter()
        BulletproofGens(curve, size, 1)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"bp_gens_new_{args.curve}_{size}",
                    "value": round(dt * 1e3, 2),
                    "unit": "ms",
                }
            ),
            flush=True,
        )
        size *= 2


if __name__ == "__main__":
    main()
