"""Per-piece timing of the segmented FS prover at n=2^16: segment A
(4 rounds @ 65536), the chunked shrink, segment B (12 rounds @ 4096),
each forced to completion with a scalar fetch. Finds where the
seg-path's wall time actually goes."""
import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ark_bulletproofs_tpu import curves, engine
from ark_bulletproofs_tpu.generators import BulletproofGens
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import ipa as dipa
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops import msm as dmsm
from ark_bulletproofs_tpu.ops.limbs import int_to_limbs, ints_to_limbs
from ark_bulletproofs_tpu.util import exp_vec

C = curves.secq256k1
engine.config.backend = "jax"
n = 1 << 16
f = C.fr
spec = dc.spec_for(C)
fr = df.spec_for(f)

t0 = time.time()
bp = BulletproofGens(C, n, 1)
G = bp.share(0).G(n)
H = bp.share(0).H(n)
print(f"gens {time.time()-t0:.0f}s", flush=True)
rng = random.Random(11)
a = [rng.randrange(f.p) for _ in range(n)]
b = [rng.randrange(f.p) for _ in range(n)]
gf = [1] * n
hf = exp_vec(f, rng.randrange(f.p), n)
Q = C.gen

X, Y, inf = dc.affine_to_device(C, list(G) + list(H))
X, Y, inf = (jax.device_put(np.asarray(v)) for v in (X, Y, inf))
p, R = f.p, f.R
mont = lambda xs: jax.device_put(ints_to_limbs([x % p * R % p for x in xs]))
A = mont(a); B_ = mont(b); GM = mont(gf); HM = mont(hf)
one_q = df.mont_one(fr, ())
qx = jnp.asarray(int_to_limbs(Q[0] * C.fq.R % C.fq.p))
qy = jnp.asarray(int_to_limbs(Q[1] * C.fq.R % C.fq.p))
st = jnp.zeros(200, jnp.uint32)
pos = jnp.uint32(0)
pb = jnp.uint32(0)
p2 = dipa._q_doubles_jit(spec, qx, qy)


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])  # scalar fetch, not a full copy


def tm(name, fn, iters=2):
    out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    print(f"{name}: {(time.time()-t0)/iters*1000:8.1f} ms", flush=True)
    return out


c65 = max(4, msm2.window_bits(1 << 16) - 2)
c4k = max(4, msm2.window_bits(4096) - 2)

segA = tm("segA 4r @65536 ", lambda: dipa._rounds_fs_seg(
    spec, fr, c65, 4, f.num_bits, True,
    X, Y, inf, A, B_, GM, HM, one_q, p2, st, pos, pb))
A2, B2, GM2, HM2 = segA[:4]
st2, pos2, pb2 = segA[4:7]

shr = tm("shrink T=16    ", lambda: dipa._shrink_fs_dev(
    spec, fr, 16, X, Y, inf, GM2, HM2))
X2, Y2, I2 = shr
cur = 4096
A2c, B2c = A2[:cur], B2[:cur]
GM3 = df.mont_one(fr, (cur,))
HM3 = df.mont_one(fr, (cur,))

segB = tm("segB 12r @4096 ", lambda: dipa._rounds_fs_seg(
    spec, fr, c4k, 12, f.num_bits, True,
    X2, Y2, I2, A2c, B2c, GM3, HM3, one_q, p2, st2, pos2, pb2))

# single-round costs at each width for reference
seg1 = tm("1 round @65536 ", lambda: dipa._rounds_fs_seg(
    spec, fr, c65, 1, f.num_bits, True,
    X, Y, inf, A, B_, GM, HM, one_q, p2, st, pos, pb))
seg1b = tm("1 round @4096  ", lambda: dipa._rounds_fs_seg(
    spec, fr, c4k, 1, f.num_bits, True,
    X2, Y2, I2, A2c, B2c, GM3, HM3, one_q, p2, st2, pos2, pb2))
print("done", flush=True)
