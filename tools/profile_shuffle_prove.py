"""Phase breakdown of the k-shuffle prove on real hardware (VERDICT r3
weak #6: the 1.31 s k=1024 TPU prove had no recorded phase table).

Runs the full ShuffleProof.prove with the r1cs/prover.py phase timers
active, one warmup (compile) + `iters` steady passes, and prints the
per-phase report plus the commit-phase remainder.

Usage: python tools/profile_shuffle_prove.py [k=1024] [iters=2]
"""

import os
import random
import sys
import time

_CURVE = os.environ.get("ABTPU_PROFILE_CURVE", "secq256k1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ark_bulletproofs_tpu import engine  # noqa: E402
from ark_bulletproofs_tpu import curves as _curves  # noqa: E402

C = getattr(_curves, _CURVE)
from ark_bulletproofs_tpu.gadgets import ShuffleProof  # noqa: E402
from ark_bulletproofs_tpu.generators import (  # noqa: E402
    BulletproofGens, PedersenGens,
)
from ark_bulletproofs_tpu.rand import seeded_rng  # noqa: E402
from ark_bulletproofs_tpu.transcript.merlin import Transcript  # noqa: E402
from ark_bulletproofs_tpu.utils import profiling  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    pc_gens = PedersenGens.default(C)
    t0 = time.time()
    bp_gens = BulletproofGens(C, 2 * k, 1)
    print(f"gens ready ({time.time() - t0:.0f}s)", flush=True)

    pyrng = random.Random(7)
    inputs = [pyrng.getrandbits(64) for _ in range(k)]
    outputs = list(inputs)
    pyrng.shuffle(outputs)

    engine.config.backend = "jax"

    def run():
        t = Transcript(b"profile shuffle")
        return ShuffleProof.prove(
            seeded_rng(5), pc_gens, bp_gens, t, inputs, outputs
        )

    t0 = time.time()
    run()  # compile
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)

    profiling.reset()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(f"\nshuffle_prove_{_CURVE}_k{k}: {dt * 1e3:.1f} ms/proof "
          f"({iters} iters)\n", flush=True)
    print(profiling.report(), flush=True)
    import re

    tracked = sum(
        float(m.group(1))
        for m in re.finditer(r"total=\s*([0-9.]+) ms", profiling.report())
    ) / iters
    print(f"\n{'(untracked: commits+transcript)':40s} "
          f"mean={dt * 1e3 - tracked:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
