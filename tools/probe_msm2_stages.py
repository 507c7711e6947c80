import sys, time, random
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import jax.numpy as jnp
from functools import partial
from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm2, kernels2 as k2
from ark_bulletproofs_tpu.ops import proj as dpj
from ark_bulletproofs_tpu.ops.msm2 import (
    _digits_all, _pad_lanes, _tmap, _excl_suffix_small, C_COLS, C1, C2,
    SCALAR_BITS, U32, NL, _log2,
)
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
curve = curves.secq256k1
spec = dc.spec_for(curve)
c = msm2.window_bits(n)
lg = _log2(n)
B = 1
W = -(-SCALAR_BITS // c)
BW = B * W
C = C_COLS
R = n // C
L = BW * C
S = 1 << c
print(f"n={n} c={c} W={W} R={R} L={L}", flush=True)

rng = ChaChaRng(bytes([5]) + bytes(31))
prng = random.Random(42)
base = [curve.rand(rng) for _ in range(256)]
pts = [base[i % 256] for i in range(n)]
ks = [prng.randrange(curve.fr.p) for _ in range(n)]
X, Y, inf = dc.affine_to_device(curve, pts)
scal = ints_to_limbs(ks)
X, Y, inf, scal = (jax.device_put(np.asarray(a)) for a in (X, Y, inf, scal))


@jax.jit
def stageA(scal):
    digits = _digits_all(scal, c, W)
    iota = jnp.arange(n, dtype=U32)[None, :]
    keys = (digits << lg) | iota
    keys = jax.lax.sort(keys, dimension=1)
    order = (keys & jnp.uint32(n - 1)).astype(jnp.int32)
    sd = keys >> lg
    return order, sd


@jax.jit
def stageB(X, Y, inf, order):
    Yz = jnp.where(inf[:, None], jnp.zeros_like(Y), Y)
    XY = X | (Yz << 16)
    ord_r = order.reshape(BW, C, R).transpose(2, 0, 1).reshape(R, L)
    return jnp.swapaxes(XY[ord_r], 1, 2)


BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
RWS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
stageC = lambda gxy: k2.suffix_madd_scan(spec, gxy, BLK, RWS)


@jax.jit
def stageD(lX, lY, lZ):
    tot = (lX[0], lY[0], lZ[0])
    t4 = _tmap(lambda a: a.reshape(NL, BW, C1, C2), tot)
    lvlA_in = _tmap(lambda a: a.transpose(3, 0, 1, 2).reshape(C2, NL, BW * C1), t4)
    lvlA_in, La = _pad_lanes(lvlA_in, 512)
    e2x, e2y, e2z, ctx, cty, ctz = k2.suffix_jac_scan(spec, *lvlA_in)
    ct = _tmap(lambda a: a[:, :La].reshape(NL, BW, C1).transpose(1, 2, 0), (ctx, cty, ctz))
    ce = _excl_suffix_small(spec, ct, C1)
    e2 = _tmap(lambda a: a[:, :, :La].reshape(C2, NL, BW, C1).transpose(2, 3, 0, 1).reshape(BW, C, NL), (e2x, e2y, e2z))
    ceb = _tmap(lambda a: jnp.broadcast_to(a[:, :, None, :], (BW, C1, C2, NL)).reshape(BW, C, NL), ce)
    excl_col = dpj.add(spec, e2, ceb)
    return excl_col


@jax.jit
def stageE(sd, lX, lY, lZ, excl_col):
    js = jnp.arange(S, dtype=U32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, js))(sd)
    valid = (js[None, :] >= 1) & (pos < n)
    posc = jnp.minimum(pos, n - 1).astype(jnp.int32)
    colj = posc // R
    rj = posc % R
    lanej = jnp.arange(BW, dtype=jnp.int32)[:, None] * C + colj
    T1 = tuple(a[rj, :, lanej] for a in (lX, lY, lZ))
    EC = _tmap(lambda a: a[jnp.arange(BW)[:, None], colj], excl_col)
    ident = dpj.point_zero(spec, valid.shape)
    T1 = dpj.select(valid, T1, ident)
    EC = dpj.select(valid, EC, ident)
    U = dpj.add(spec, T1, EC)
    return U


@jax.jit
def stageF(U):
    K1 = 16 if S <= 1024 else 64
    M1 = S // K1
    p1_in = _tmap(lambda a: a.reshape(BW, K1, M1, NL).transpose(1, 3, 0, 2).reshape(K1, NL, BW * M1), U)
    p1_in, L1 = _pad_lanes(p1_in, 512)
    part1 = k2.rowsum_jac(spec, *p1_in)
    p2_in = _tmap(lambda a: a[:, :L1].reshape(NL, BW, M1).transpose(2, 0, 1), part1)
    p2_in, L2 = _pad_lanes(p2_in, 128)
    wsum = k2.rowsum_jac(spec, *p2_in, block=128)
    return wsum, L2


def stageG(wsum, L2):
    h_in = _tmap(lambda a: a[:, :L2].reshape(NL, B, W).transpose(2, 0, 1), wsum)
    h_in, L3 = _pad_lanes(h_in, 128)
    acc = k2.horner_windows(spec, *h_in, c)
    return acc


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    for x in leaves:
        if hasattr(x, "ndim") and hasattr(x, "devices"):
            jax.device_get(x[(0,) * x.ndim])  # scalar fetch forces exec
    return leaves


RPC = None


def _fetch_one(out):
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ndim") and hasattr(x, "devices"):
            jax.device_get(x[(0,) * x.ndim])
            return


def tm(name, f, *a):
    global RPC
    out = f(*a)
    _fetch_one(out)
    if RPC is None:
        t0 = time.time()
        for _ in range(5):
            _fetch_one(out)
        RPC = (time.time() - t0) / 5
        print(f"(rpc latency: {RPC*1000:.1f} ms)", flush=True)
    k = 10
    t0 = time.time()
    for _ in range(k):
        out = f(*a)
    _fetch_one(out)
    dt = (time.time() - t0 - RPC) / k
    print(f"{name}: {dt*1000:7.1f} ms", flush=True)
    return out


@jax.jit
def stageE1(sd):
    js = jnp.arange(S, dtype=U32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, js))(sd)
    return pos


@jax.jit
def stageE2(pos, lX, lY, lZ, excl_col):
    valid = (jnp.arange(S, dtype=U32)[None, :] >= 1) & (pos < n)
    posc = jnp.minimum(pos, n - 1).astype(jnp.int32)
    colj = posc // R
    rj = posc % R
    lanej = jnp.arange(BW, dtype=jnp.int32)[:, None] * C + colj
    T1 = tuple(a[rj, :, lanej] for a in (lX, lY, lZ))
    EC = _tmap(lambda a: a[jnp.arange(BW)[:, None], colj], excl_col)
    return T1, EC, valid


@jax.jit
def stageE3(T1, EC, valid):
    ident = dpj.point_zero(spec, valid.shape)
    T1 = dpj.select(valid, T1, ident)
    EC = dpj.select(valid, EC, ident)
    return dpj.add(spec, T1, EC)


@jax.jit
def stageE2b(pos, lX, lY, lZ, excl_col):
    """E2 variant: physically transpose locals to point-major once
    (bandwidth-bound), then 64-byte-row gathers (dispatch ~6 ns/row)
    instead of strided middle-axis gathers."""
    valid = (jnp.arange(S, dtype=U32)[None, :] >= 1) & (pos < n)
    posc = jnp.minimum(pos, n - 1).astype(jnp.int32)
    colj = posc // R
    rj = posc % R
    lanej = jnp.arange(BW, dtype=jnp.int32)[:, None] * C + colj
    flat = (rj * L + lanej).reshape(-1)
    T1 = tuple(
        a.transpose(0, 2, 1).reshape(R * L, NL)[flat].reshape(BW, S, NL)
        for a in (lX, lY, lZ)
    )
    EC = _tmap(lambda a: a[jnp.arange(BW)[:, None], colj], excl_col)
    return T1, EC, valid


order, sd = tm("A digits+sort  ", stageA, scal)
gxy = tm("B gather/layout", stageB, X, Y, inf, order)
lX, lY, lZ = tm("C madd scan    ", stageC, gxy)
excl_col = tm("D col carries  ", stageD, lX, lY, lZ)
U = tm("E bucket gather", stageE, sd, lX, lY, lZ, excl_col)
pos = tm("  E1 searchsort", stageE1, sd)
T1EC = tm("  E2 gathers   ", stageE2, pos, lX, lY, lZ, excl_col)
_ = tm("  E2b transp+rg", stageE2b, pos, lX, lY, lZ, excl_col)
_ = tm("  E3 sel+add   ", stageE3, *T1EC)
(wsum, L2) = tm("F rowsum       ", stageF, U)
acc = tm("G horner       ", stageG, wsum, L2)
