"""Headline benchmark: device MSM throughput (points/s) on secq256k1.

Prints ONE JSON line. The metric mirrors BASELINE.md's north star
(MSM points/s/chip); `vs_baseline` compares against a single-thread
arkworks-CPU Pippenger estimate for secq256k1 (the reference publishes
no numbers — BASELINE.md — so the denominator is the commonly measured
~8e5 points/s for ark-ec 0.4 Fp256 MSM on one modern x86 core, recorded
here as a fixed constant so rounds stay comparable).

The run self-checks: the device result is compared against the exact
host Pippenger on the same inputs before any timing is reported.
"""

from __future__ import annotations

import json
import sys
import time

# Fixed reference denominator (see module docstring).
REFERENCE_CPU_MSM_PPS = 800_000.0


def main() -> None:
    import numpy as np

    import jax

    from ark_bulletproofs_tpu import curves
    from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import msm as dmsm
    from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

    curve = curves.secq256k1
    spec = dc.spec_for(curve)

    platform = jax.devices()[0].platform
    log_n = 16 if platform != "cpu" else 10
    n = 1 << log_n
    c = dmsm._window_bits(n)

    rng = ChaChaRng(bytes([5]) + bytes(31))
    base_pts = [curve.rand(rng) for _ in range(64)]
    pts = [base_pts[i % 64] for i in range(n)]
    ks_base = [curve.fr.rand(rng) for _ in range(4096)]
    ks = [ks_base[i % 4096] for i in range(n)]

    X, Y, inf = dc.affine_to_device(curve, pts)
    scal = ints_to_limbs(ks)
    # Pin inputs on device: the axon tunnel's host<->device link is slow,
    # and the protocol keeps bases resident in real use.
    X, Y, inf, scal = (
        jax.device_put(np.asarray(a)) for a in (X, Y, inf, scal)
    )

    # compile + self-check against the exact host Pippenger
    out = dmsm.msm_device(spec, c, X, Y, inf, scal)
    jax.block_until_ready(out)
    got = dc.point_to_host(curve, out)
    want = curve.msm(pts, ks)
    if got != want:
        print(
            json.dumps(
                {
                    "metric": f"msm_secq256k1_n{n}_{platform}",
                    "value": 0.0,
                    "unit": "points/s",
                    "vs_baseline": 0.0,
                    "error": "device result mismatch vs host Pippenger",
                }
            )
        )
        sys.exit(1)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dmsm.msm_device(spec, c, X, Y, inf, scal)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    print(
        json.dumps(
            {
                "metric": f"msm_secq256k1_n{n}_{platform}",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / REFERENCE_CPU_MSM_PPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
