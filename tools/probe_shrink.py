"""Stage timing of one segmented-shrink chunk (B=2048 sets x T=16):
the batched msm2, its internal stages, and the batch affine inversion —
isolates the 8.4 s shrink regression."""
import random
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import fs
from ark_bulletproofs_tpu.ops import kernels2 as k2
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

C = curves.secq256k1
spec = dc.spec_for(C)
fr = df.spec_for(C.fr)
fq = spec.fq
rng = ChaChaRng(bytes([13]) + bytes(31))
prng = random.Random(17)

Nt = 1 << 17  # table width 2N
B, T = 2048, 16
base = [C.rand(rng) for _ in range(256)]
pts = [base[i % 256] for i in range(Nt)]
X, Y, inf = dc.affine_to_device(C, pts)
X, Y, inf = (jax.device_put(np.asarray(v)) for v in (X, Y, inf))
ks = [[prng.randrange(C.fr.p) for _ in range(T)] for _ in range(B)]
scal = jax.device_put(np.stack([np.asarray(ints_to_limbs(k)) for k in ks]))
bmn = np.stack([
    np.random.permutation(Nt)[:T].astype(np.int32) for _ in range(B)
])
bm = jax.device_put(bmn)
c = msm2.window_bits(T)
print(f"B={B} T={T} c={c}", flush=True)


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])  # scalar fetch, not a full copy


def tm(name, fn, iters=3):
    out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    print(f"{name}: {(time.time()-t0)/iters*1000:8.1f} ms", flush=True)
    return out


g = msm2._Cfg(T, c, B)
f_sort = jax.jit(lambda s: msm2._stage_sort(g, s))
order, sd = tm("sort      ", lambda: f_sort(scal))
f_gather = jax.jit(lambda o: msm2._stage_gather(g, X, Y, inf, o, bm))
gxy = tm("gather    ", lambda: f_gather(order))
locs = tm("madd scan ", lambda: k2.suffix_madd_scan(spec, gxy))
f_car = jax.jit(lambda *ls: msm2._stage_carries(g, spec, *ls))
excl = tm("carries   ", lambda: f_car(*locs))
f_bkt = jax.jit(lambda s, e, *ls: msm2._stage_buckets(g, spec, s, e, *ls))
U = tm("buckets   ", lambda: f_bkt(sd, excl, *locs))
f_rs = jax.jit(lambda u: msm2._stage_rowsum(g, spec, u))
ws = tm("rowsum    ", lambda: f_rs(U))
f_h = jax.jit(lambda w: msm2._stage_horner(g, spec, w))
acc = tm("horner    ", lambda: f_h(ws))
out = tm("msm2 whole", lambda: msm2.msm2_impl(spec, c, X, Y, inf, scal, bm))
z = out[2]
tm("pow-inv   ", lambda: fs.mont_pow_pm2(fq, z), iters=2)
tm("batch-inv ", lambda: fs.mont_inv_batch(fq, z), iters=3)
# correctness of batch inverse
zi = fs.mont_inv_batch(fq, z)
onecheck = df.mont_mul(fq, z, zi)
one = df.mont_one(fq, (B,))
assert bool(jnp.all(onecheck == one)), "batch inverse wrong"
print("batch-inv correct", flush=True)
