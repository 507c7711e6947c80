"""Quick on-TPU msm2 correctness check vs the exact host Pippenger.

Covers: fused path (n=1024, B=1 and B=2 + base_map), staged path
(n=2^17, B=1), on both curve models (secq256k1 SW / curve25519 TE).
Run after touching msm2 stage code or the kernels2 group bodies.
"""
import random
import sys

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

prng = random.Random(1)


def run(curve, n, B, use_map, label):
    spec = dc.spec_for(curve)
    rng = ChaChaRng(bytes([9]) + bytes(31))
    base = [curve.rand(rng) for _ in range(128)]
    pts = [base[i % 128] for i in range(n)]
    X, Y, inf = dc.affine_to_device(curve, pts)
    X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))
    kss = [[prng.randrange(curve.fr.p) for _ in range(n)] for _ in range(B)]
    scal = np.stack([np.asarray(ints_to_limbs(ks)) for ks in kss])
    bm = bmn = None
    if use_map:
        bmn = np.stack(
            [np.random.permutation(n).astype(np.int32) for _ in range(B)]
        )
        bm = jax.device_put(bmn)
    if B == 1 and not use_map:
        scal = scal[0]
    c = msm2.window_bits(n)
    out = msm2.msm2_device_jac(spec, c, X, Y, inf, jax.device_put(scal), bm)
    outs = np.asarray(np.stack(out))  # (NCOORD, [B,] 16)
    if outs.ndim == 2:
        outs = outs[:, None, :]
    for b in range(B):
        if dc.is_te(spec):
            got = dc.point_to_host(curve, tuple(outs[:, b]))
            if got is None:
                got = curve.zero()
        else:
            got = curve.to_affine(
                dc.jacobian_batch_ints(curve, outs[:, b:b + 1])[0]
            )
        # points repeat every 128, so the exact host reference is a
        # 128-term MSM over per-base aggregated scalars (works for both
        # models without a slow n-term host Pippenger)
        agg = [0] * 128
        src = bmn[b] if use_map else range(n)
        for i, j in enumerate(src):
            agg[j % 128] = (agg[j % 128] + kss[b][i]) % curve.fr.p
        want = curve.msm(base, agg)
        assert curve.eq(got, want), f"{label} b={b} MISMATCH"
    print(f"ok {label}", flush=True)


for cname in ("secq256k1", "curve25519"):
    curve = getattr(curves, cname)
    run(curve, 1024, 1, False, f"fused n=1024 B=1 {cname}")
    run(curve, 1024, 2, True, f"fused n=1024 B=2 base_map {cname}")
# small-set batched shape (R=1, C<=64): the segmented-shrink / batch-FS
# bucket select-sum path
run(curves.secq256k1, 16, 64, True, "fused n=16 B=64 base_map secq")
run(curves.secq256k1, 64, 8, False, "fused n=64 B=8 secq")
run(curves.secq256k1, 1 << 17, 1, False, "staged n=2^17 B=1 secq256k1")
run(curves.curve25519, 1 << 17, 1, False, "staged n=2^17 B=1 curve25519")
print("ALL OK", flush=True)
