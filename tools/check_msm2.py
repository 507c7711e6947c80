"""Quick on-TPU msm2 correctness check vs the exact host Pippenger.

Covers: fused path (n=1024, B=1 and B=2 + base_map), staged path
(n=2^17, B=1). Run after touching msm2 stage code.
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
from ark_bulletproofs_tpu.ops import proj as dpj
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

curve = curves.secq256k1
spec = dc.spec_for(curve)
prng = random.Random(1)
rng = ChaChaRng(bytes([9]) + bytes(31))
base = [curve.rand(rng) for _ in range(128)]


def host_msm(pts, ks):
    acc = curve.zero()
    for P, k in zip(pts, ks):
        acc = curve.add(acc, curve.mul(P, k))
    return acc


def run(n, B, use_map, label):
    pts = [base[i % 128] for i in range(n)]
    X, Y, inf = dc.affine_to_device(curve, pts)
    X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))
    kss = [[prng.randrange(curve.fr.p) for _ in range(n)] for _ in range(B)]
    scal = np.stack([np.asarray(ints_to_limbs(ks)) for ks in kss])
    bm = None
    if use_map:
        bmn = np.stack(
            [np.random.permutation(n).astype(np.int32) for _ in range(B)]
        )
        bm = jax.device_put(bmn)
    if B == 1 and not use_map:
        scal = scal[0]
    c = msm2.window_bits(n)
    out = msm2.msm2_device_jac(spec, c, X, Y, inf, jax.device_put(scal), bm)
    outs = np.asarray(np.stack(out))
    if outs.ndim == 2:
        outs = outs[:, None, :]
    for b in range(B):
        got = dc.jacobian_batch_ints(curve, outs[:, b:b + 1])[0]
        got = curve.to_affine(got)
        if use_map:
            want = host_msm([pts[j] for j in bmn[b]], kss[b])
        else:
            want = host_msm(pts, kss[b])
        assert curve.eq(got, want), f"{label} b={b} MISMATCH"
    print(f"ok {label}", flush=True)


run(1024, 1, False, "fused n=1024 B=1")
run(1024, 2, True, "fused n=1024 B=2 base_map")
run(1 << 17, 1, False, "staged n=2^17 B=1")
print("ALL OK", flush=True)
