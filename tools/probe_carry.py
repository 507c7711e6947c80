"""Micro-timing of the small-c2 carry path pieces at the shrink shape:
dpj.add / select / point_zero / shift / full _excl_suffix_small over
(BW=131072, 16) points, plus a kernel-based alternative."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import kernels2 as k2
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops import proj as dpj

spec = dc.spec_for(curves.secq256k1)
BW, m = 131072, 16
rng = np.random.default_rng(3)
mk = lambda: jax.device_put(
    rng.integers(0, 1 << 16, size=(BW, m, 16), dtype=np.int64)
    .astype(np.uint32))
P = (mk(), mk(), mk())
Q = (mk(), mk(), mk())


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def tm(name, fn, iters=4):
    out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    print(f"{name}: {(time.time()-t0)/iters*1000:8.1f} ms", flush=True)
    return out


add_j = jax.jit(lambda a, b: dpj.add(spec, a, b), static_argnums=())
tm("dpj.add 2.1M lanes ", lambda: add_j(P, Q))
sel_j = jax.jit(lambda a, b: dpj.select(
    jnp.zeros((BW, m), bool), a, b))
tm("dpj.select         ", lambda: sel_j(P, Q))
pz_j = jax.jit(lambda: dpj.point_zero(spec, (BW, m)))
tm("point_zero         ", lambda: pz_j())
sh_j = jax.jit(lambda a: tuple(msm2._shift_up(c, 4, m) for c in a))
tm("shift_up           ", lambda: sh_j(P))
es_j = jax.jit(lambda a: msm2._excl_suffix_small(spec, a, m))
tm("excl_suffix_small  ", lambda: es_j(P))

# kernel alternative: rows = chunk axis
def kern_suffix(a):
    t = tuple(c.transpose(1, 2, 0) for c in a)  # (m, NL, BW)
    outs = k2.suffix_jac_scan(spec, *t, block=512, rows=8)
    return outs[:3]

kj = jax.jit(kern_suffix)
tm("kernel suffix m-row", lambda: kj(P))
print("done", flush=True)
