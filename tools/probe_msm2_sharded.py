"""Validate the sharded v2 mega-kernel composition on hardware.

Only one TPU chip is reachable (axon tunnel), so this runs the sharded
program over a 1-device mesh: it exercises the exact production path —
shard_map partitioning, the per-shard Pallas mega-kernel pipeline, the
jacobian conversion, and the partial tree-reduce — on the real chip, and
checks bit-exactness against the exact host Pippenger. Multi-device
correctness of the same composition is covered by
tests/test_parallel.py::test_sharded_msm2_matches_host on the 8-device
CPU mesh (interpret mode). Also asserts the engine routing picks the v2
sharded path ("arrays2") when a mesh is installed.

Usage: python tools/probe_msm2_sharded.py [n=65536]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    import jax
    import numpy as np

    import bench
    from ark_bulletproofs_tpu import curves, engine
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import msm2
    from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs
    from ark_bulletproofs_tpu.parallel import msm as pmsm
    from ark_bulletproofs_tpu.parallel.mesh import make_mesh

    curve = curves.secq256k1
    spec = dc.spec_for(curve)
    D = len(jax.devices())
    print(f"platform: {jax.devices()[0].platform}  devices: {D}  n: {n}")

    prng = random.Random(2024)
    ks = [prng.randrange(curve.fr.p) for _ in range(n)]
    pts, want = bench._workload(curve, n, ks)

    X, Y, inf = dc.affine_to_device(curve, pts)
    X, Y, inf, scal = (
        jax.device_put(np.asarray(a))
        for a in (X, Y, inf, ints_to_limbs(ks))
    )

    mesh = make_mesh(D)
    c = msm2.window_bits(n // D)
    fn, _ = pmsm.sharded_msm2_device_fn(spec, c, mesh)
    fn = jax.jit(fn)
    t0 = time.time()
    out = fn(X, Y, inf, scal)
    jax.block_until_ready(out)
    print(f"compile+run: {time.time() - t0:.1f}s")
    got = dc.jacobian_to_host(curve, out)
    assert got == want, "sharded v2 mismatch vs host Pippenger"
    print("OK sharded v2 (mesh D=%d)" % D)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(X, Y, inf, scal))
    dt = (time.perf_counter() - t0) / iters
    print(f"sharded v2 n={n} D={D} c={c}: {dt * 1e3:.1f} ms  "
          f"{n / dt:,.0f} pts/s")

    # Routing: with a mesh installed, msm_device_maybe_sharded must pick
    # the v2 sharded path for well-shaped inputs.
    engine.set_mesh(mesh)
    try:
        pmsm._JIT_CACHE.clear()
        out2 = pmsm.msm_device_maybe_sharded(
            spec, msm2.window_bits(n), X, Y, inf, scal
        )
        jax.block_until_ready(out2)
        keys = [k[0] for k in pmsm._JIT_CACHE]
        got2 = dc.jacobian_to_host(curve, out2)
        assert got2 == want, "routed sharded MSM mismatch"
        if D > 1:
            assert "arrays2" in keys, f"mesh routing did not pick v2: {keys}"
            print("OK routing -> arrays2 (sharded v2)")
        else:
            print(f"OK routing (D=1 mesh; cache keys: {keys})")
    finally:
        engine.set_mesh(None)


if __name__ == "__main__":
    main()
