"""Break down the TE (curve25519) k=1024 shuffle verify: where do the
~2 s go? Times the ragged mega-MSM alone at the verify shape, its
per-chunk v2/v1 splits, and the host glue around them."""
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
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs
from ark_bulletproofs_tpu.parallel.msm import msm_device_ragged
from ark_bulletproofs_tpu.ops import msm as dmsm

curve = curves.curve25519
spec = dc.spec_for(curve)
rng = ChaChaRng(bytes([3]) + bytes(31))
prng = random.Random(5)
base = [curve.rand(rng) for _ in range(64)]

n = 8175  # the k=1024 shuffle verify mega-MSM width
pts = [base[i % 64] for i in range(n)]
ks = [prng.randrange(curve.fr.p) for _ in range(n)]
X, Y, inf = dc.affine_to_device(curve, pts)
X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))
scal = jax.device_put(np.asarray(ints_to_limbs(ks)))


def tm(name, f, iters=4):
    out = f()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    t0 = time.time()
    for _ in range(iters):
        out = f()
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    print(f"{name}: {(time.time() - t0) / iters * 1000:7.1f} ms",
          flush=True)


tm("ragged 8175   ", lambda: msm_device_ragged(spec, X, Y, inf, scal))
for sz in (4096, 2048, 1024):
    Xs, Ys, Is, Ss = X[:sz], Y[:sz], inf[:sz], scal[:sz]
    tm(f"v2 n={sz}   ",
       lambda Xs=Xs, Ys=Ys, Is=Is, Ss=Ss, sz=sz: msm2.msm2_device_jac(
           spec, msm2.window_bits(sz), Xs, Ys, Is, Ss))
for sz in (512, 256):
    Xs, Ys, Is, Ss = X[:sz], Y[:sz], inf[:sz], scal[:sz]
    tm(f"v1 n={sz}    ",
       lambda Xs=Xs, Ys=Ys, Is=Is, Ss=Ss, sz=sz: dmsm.msm_device(
           spec, dmsm._window_bits(sz), Xs, Ys, Is, Ss))
print("done", flush=True)
