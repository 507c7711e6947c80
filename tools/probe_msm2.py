# Copied from the round-2 /tmp probes; validates msm2 vs host Pippenger then times it.
import sys, time, random
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import jax.numpy as jnp
from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm2, proj as dpj
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
curve = curves.secq256k1
spec = dc.spec_for(curve)
print("platform:", jax.devices()[0].platform, "n:", n, flush=True)

rng = ChaChaRng(bytes([5]) + bytes(31))
prng = random.Random(42)
base = [curve.rand(rng) for _ in range(256)]
# mix: distinct-ish points via small scalar mults of random bases
pts = [base[i % 256] for i in range(n)]
ks = [prng.randrange(curve.fr.p) for _ in range(n)]
# edge cases
pts[3] = None
ks[7] = 0

X, Y, inf = dc.affine_to_device(curve, pts)
scal = ints_to_limbs(ks)
X, Y, inf, scal = (jax.device_put(np.asarray(a)) for a in (X, Y, inf, scal))

c = msm2.window_bits(n)
print("c:", c, flush=True)
t0 = time.time()
out = msm2.msm2_device(spec, c, X, Y, inf, scal)
jax.block_until_ready(out)
print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
got = dpj.point_to_host(curve, out)
t0 = time.time()
want = curve.msm(pts, ks)
print(f"host msm: {time.time()-t0:.1f}s", flush=True)
assert got == want, f"MISMATCH\n got={got}\nwant={want}"
print("OK single scalar set", flush=True)

# timing
iters = 5 if n <= (1 << 17) else 3
t0 = time.time()
for _ in range(iters):
    out = msm2.msm2_device(spec, c, X, Y, inf, scal)
    jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print(f"n={n} c={c}: {dt*1000:.1f} ms  {n/dt:,.0f} pts/s", flush=True)
if n >= (1 << 19):
    print("skip batch (memory)", flush=True)
    raise SystemExit(0)

# batch of 2 scalar sets
ks2 = [prng.randrange(curve.fr.p) for _ in range(n)]
scalB = ints_to_limbs(ks + ks2).reshape(2, n, 16)
scalB = jax.device_put(np.asarray(scalB))
t0 = time.time()
outB = msm2.msm2_device(spec, c, X, Y, inf, scalB)
jax.block_until_ready(outB)
print(f"batch compile+run: {time.time()-t0:.1f}s", flush=True)
g0 = dpj.point_to_host(curve, tuple(a[0] for a in outB))
g1 = dpj.point_to_host(curve, tuple(a[1] for a in outB))
assert g0 == want, "batch[0] mismatch"
assert g1 == curve.msm(pts, ks2), "batch[1] mismatch"
print("OK batch", flush=True)

# timing
iters = 5
t0 = time.time()
for _ in range(iters):
    out = msm2.msm2_device(spec, c, X, Y, inf, scal)
    jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print(f"n={n} c={c}: {dt*1000:.1f} ms  {n/dt:,.0f} pts/s", flush=True)
