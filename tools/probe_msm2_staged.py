"""Compare the fused one-program v2 MSM against the host-chained staged
variant (ops/msm2.py::msm2_device_staged) on hardware.

Motivation: at n=2^20 the fused program measured 749 ms/call while the
individually-timed stages sum to ~384 ms (tools/probe_msm2_stages.py) —
if the staged chain recovers that gap, it becomes the production path.

Usage: python tools/probe_msm2_staged.py [n=1048576] [iters=5]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import numpy as np

    import bench
    from ark_bulletproofs_tpu import curves
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import msm2
    from ark_bulletproofs_tpu.ops import proj as dpj
    from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

    curve = curves.secq256k1
    spec = dc.spec_for(curve)
    prng = random.Random(2024)
    ks = [prng.randrange(curve.fr.p) for _ in range(n)]
    pts, want = bench._workload(curve, n, ks)
    X, Y, inf = dc.affine_to_device(curve, pts)
    X, Y, inf, scal = (
        jax.device_put(np.asarray(a))
        for a in (X, Y, inf, ints_to_limbs(ks))
    )
    c = msm2.window_bits(n)
    print(f"n={n} c={c} platform={jax.devices()[0].platform}", flush=True)

    for name, fn in (
        ("staged", lambda: msm2.msm2_device_staged(spec, c, X, Y, inf, scal)),
        ("fused ", lambda: msm2.msm2_device(spec, c, X, Y, inf, scal)),
    ):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"{name} compile+run: {time.time() - t0:.1f}s", flush=True)
        got = dpj.point_to_host(curve, out)
        assert got == want, f"{name} mismatch"
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:7.1f} ms  {n / dt:,.0f} pts/s", flush=True)


if __name__ == "__main__":
    main()
