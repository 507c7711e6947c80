"""Stage-B gather ceiling probe (round 5).

Stage B of the staged v2 MSM (ops/msm2.py::_stage_gather) costs 148 ms
at n=2^20 — 40% of the whole pipeline — gathering W*n = 23M packed
64-byte rows from the (n, 16) u32 table into limb-major (R, NL, L).
This probe isolates the gather from the MSM to find the real hardware
ceiling and test cheaper formulations:

  g0  full stage B (gather + swapaxes)            [the 148 ms baseline]
  g1  gather only, row-major out (no swapaxes)
  g2  swapaxes only (on a materialized gather output)
  g3  gather with iota indices (sequential rows -> bandwidth bound)
  g4  gather with per-row SORTED random indices (locality dependence)
  g5  32-byte rows: (n, 8) table, same row count (row-size dependence)
  g6  128-byte rows: (n, 32) table, same row count (the published cliff)
  g7  lane-axis gather: (16, n) table, out[:, j] = T[:, idx[j]]
  g8  flat single-axis gather: (n*16,) -> 23M x 16 element indices
  g9  small table (2^16 rows), same 23M gathered rows (latency dep.)
  g10 half rows (11 of 22 windows) (linearity check)

Usage: python tools/probe_gather.py [n]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
W = 22
C = 1024
R = n // C
L = W * C
NL = 16

rng = np.random.default_rng(7)
XY = jnp.asarray(rng.integers(0, 2**32, size=(n, NL), dtype=np.uint64)
                 .astype(np.uint32))
order = jnp.asarray(
    np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32)
)  # (W, n)
print(f"n={n} rows={W * n / 1e6:.1f}M table={n * NL * 4 / 2**20:.0f}MiB",
      flush=True)

RPC = None


def tm(name, f, *a, iters=8):
    global RPC
    out = f(*a)
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(first[(0,) * first.ndim])
    if RPC is None:
        t0 = time.time()
        for _ in range(5):
            np.asarray(first[(0,) * first.ndim])
        RPC = (time.time() - t0) / 5
        print(f"(rpc {RPC * 1000:.1f} ms)", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(first[(0,) * first.ndim])
    dt = (time.time() - t0 - RPC) / iters
    ns_row = dt / (W * n) * 1e9
    print(f"{name}: {dt * 1000:7.1f} ms  {ns_row:5.2f} ns/row", flush=True)
    return dt


ord_r = order.reshape(W, C, R).transpose(2, 0, 1).reshape(R, L)


@jax.jit
def g0(XY, ord_r):
    return jnp.swapaxes(XY[ord_r], 1, 2)


@jax.jit
def g1(XY, ord_r):
    return XY[ord_r]


@jax.jit
def g2(g):
    return jnp.swapaxes(g, 1, 2)


iota_r = jnp.asarray(
    np.arange(W * n, dtype=np.int64).reshape(R, L) % n
).astype(jnp.int32)

sorted_r = jnp.asarray(np.sort(np.asarray(order), axis=1)
                       .reshape(W, C, R).transpose(2, 0, 1).reshape(R, L)
                       .astype(np.int32))

XY8 = XY[:, :8]
XY32 = jnp.concatenate([XY, XY], axis=1)
XYT = XY.T  # (16, n)
XYflat = XY.reshape(-1)
small = XY[: 1 << 16]
ord_small = jnp.asarray((np.asarray(ord_r) % (1 << 16)).astype(np.int32))
ord_half = ord_r[:, : L // 2]


@jax.jit
def g5(t, o):
    return t[o]


@jax.jit
def g7(XYT, ord_flat):
    return jnp.take(XYT, ord_flat, axis=1)


@jax.jit
def g8(flat, o):
    idx = o[..., None] * NL + jnp.arange(NL, dtype=jnp.int32)
    return flat[idx]


tm("g0 stageB      ", g0, XY, ord_r)
tm("g1 gather only ", g1, XY, ord_r)
gout = g1(XY, ord_r)
tm("g2 swap only   ", g2, gout)
del gout
tm("g3 iota idx    ", g1, XY, iota_r)
tm("g4 sorted idx  ", g1, XY, sorted_r)
tm("g5 32B rows    ", g5, XY8, ord_r)
tm("g6 128B rows   ", g5, XY32, ord_r, iters=3)
tm("g7 lane gather ", g7, XYT, ord_r.reshape(-1), iters=3)
tm("g8 flat element", g8, XYflat, ord_r, iters=3)
tm("g9 small table ", g5, small, ord_small)
d10 = tm("g10 half rows  ", g5, XY, ord_half)
print(f"(g10 scaled x2: {d10 * 2 * 1000:.1f} ms)", flush=True)
