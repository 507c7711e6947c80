"""Profile one compact IPA round at n=2^16 on hardware: round-scalar
build, MSM (fused vs staged, c sweep), fold, fetch. Run under an idle
host for clean numbers. Usage: python tools/probe_ipa_round.py [logn]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.generators import GeneratorsChain
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import ipa as dipa
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops.limbs import N_LIMBS, ints_to_limbs

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << logn
curve = curves.secq256k1
spec = dc.spec_for(curve)
fr = df.spec_for(curve.fr)
f = curve.fr
prng = random.Random(7)

print(f"n = 2^{logn}", flush=True)
t0 = time.time()
# two N-sized takes (the farm shape the benches already exercise)
pts = GeneratorsChain(curve, b"roundprobe").take(N)
pts += GeneratorsChain(curve, b"roundprobe2").take(N)
print(f"gens {time.time()-t0:.0f}s", flush=True)
X, Y, inf = dc.affine_to_device(curve, pts)
X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))


def mont(k):
    return ints_to_limbs([x % f.p * f.R % f.p for x in k])


rnd = lambda: [prng.randrange(f.p) for _ in range(N)]  # noqa: E731
a = jax.device_put(mont(rnd()))
b = jax.device_put(mont(rnd()))
gm = jax.device_put(mont(rnd()))
hm = jax.device_put(mont(rnd()))
one = df.mont_one(fr, ())


def timeit(fn, iters=4, warm=1):
    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


m = jnp.uint32(N // 2)
curm1 = jnp.uint32(N - 1)

t = timeit(lambda: dipa._round_scalars_compact(fr, a, b, gm, hm, one, m, curm1))
print(f"round_scalars_compact: {t*1e3:.1f} ms", flush=True)

rows, bm, cq = dipa._round_scalars_compact(fr, a, b, gm, hm, one, m, curm1)
rows = jax.block_until_ready(rows)

for c in (10, 12):
    if c + logn > 32:
        continue
    t = timeit(lambda: msm2.msm2_device(spec, c, X, Y, inf, rows, bm))
    print(f"msm2 fused   c={c}: {t*1e3:.1f} ms", flush=True)
    t = timeit(
        lambda: msm2.msm2_device_staged(spec, c, X, Y, inf, rows, bm)
    )
    print(f"msm2 staged  c={c}: {t*1e3:.1f} ms", flush=True)

u = prng.randrange(f.p)
ul = jnp.asarray(ints_to_limbs([u * f.R % f.p])[0])
uil = jnp.asarray(ints_to_limbs([f.inv(u) * f.R % f.p])[0])
t = timeit(lambda: dipa._fold(fr, a, b, gm, hm, ul, uil, m, curm1))
print(f"fold: {t*1e3:.1f} ms", flush=True)

pts_d = msm2.msm2_device_jac(spec, 10, X, Y, inf, rows, bm)
stack = jnp.concatenate([jnp.stack(pts_d).reshape(6, N_LIMBS), cq], axis=0)
stack = jax.block_until_ready(stack)
t0 = time.perf_counter()
for _ in range(4):
    _ = np.asarray(stack)
print(f"fetch (8x16 u32): {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)
