"""Full-msm2 interpret-mode validation on CPU (no TPU needed).

Runs the ENTIRE v2 Pippenger (digits -> packed sort -> packed-coord
gather -> suffix scan -> carries -> telescoped buckets -> Horner) in
Pallas interpret mode at the minimum size (n = 1024, the smallest the
kernel layout supports) and checks the result against the exact host
Pippenger. Interpret compile is pathological at larger n (>25 min at
2^12+; ~22 min at n=1024 on the 4-core container), so this is a tools/
script rather than a pytest case — run it after any kernel or msm2-glue
change when the TPU is unavailable. Validated 2026-08-18 (packed
gather): MSM2 INTERPRET OK in 1346 s.
"""
import sys, time, random

sys.path.insert(0, "/root/repo")
import jax

if jax.devices()[0].platform != "cpu":
    raise SystemExit("run with JAX_PLATFORMS=cpu (interpret mode)")
import numpy as np
from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm2, proj as dpj
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

n = 1024
curve = curves.secq256k1
spec = dc.spec_for(curve)
rng = ChaChaRng(bytes([5]) + bytes(31))
prng = random.Random(42)
base = [curve.rand(rng) for _ in range(64)]
pts = [base[i % 64] for i in range(n)]
ks = [prng.randrange(curve.fr.p) for _ in range(n)]
pts[3] = None
ks[7] = 0
X, Y, inf = dc.affine_to_device(curve, pts)
scal = ints_to_limbs(ks)
c = msm2.window_bits(n)
print("interpret msm2 n=1024 c=", c, flush=True)
t0 = time.time()
out = msm2.msm2_device(spec, c, X, Y, np.asarray(inf), scal)
jax.block_until_ready(out)
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
got = dpj.point_to_host(curve, out)
want = curve.msm(pts, ks)
assert got == want, f"MISMATCH {got} != {want}"
print("MSM2 INTERPRET OK", flush=True)
