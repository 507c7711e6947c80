"""Pre-build the bench workload cache for a given n (host-only).

Generates n distinct generator-chain points and the exact host-Pippenger
MSM result for the fixed bench scalar stream (seed 2024, matching
bench.py), and writes benches/.bench_points_secq256k1_<n>.npz so the
round-end bench run pays no host recompute. Run with JAX_PLATFORMS=cpu;
touches no accelerator.
"""

from __future__ import annotations

import os
import random
import sys
import time

# Must be set before ark_bulletproofs_tpu imports: keeps the generator
# chain on the sequential host path (the axon sitecustomize pre-imports
# jax, so JAX_PLATFORMS from the shell is NOT honored — observed: the
# "CPU" builder dialed the TPU tunnel mid-bench and 500'd its compile).
os.environ["ABTPU_BACKEND"] = "host"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench
    from ark_bulletproofs_tpu import curves

    curve = curves.secq256k1
    prng = random.Random(2024)
    ks = [prng.randrange(curve.fr.p) for _ in range(n)]
    t0 = time.time()
    pts, want = bench._workload(curve, n, ks)
    print(f"cache ready: n={n} want={hex(want[0])[:18]}... "
          f"({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
