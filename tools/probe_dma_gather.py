"""Pallas per-row-DMA gather microprobe (round 5).

probe_gather.py established that XLA's gather runs at a fixed ~6.4
ns/row for 64-byte rows REGARDLESS of index pattern (iota == random ==
sorted), i.e. it is a descriptor-issue-rate floor, not a memory-system
limit (the same bytes move at 810 GB/s as a transpose). This probe
cross-checks the only other mechanism the hardware exposes for
arbitrary row reordering: manual per-row async DMA descriptors issued
from a Pallas kernel's scalar core (indices staged through SMEM).

If this also lands at ~6 ns/row the 64B-row reorder rate is a measured
platform ceiling from two independent mechanisms; if it is faster, the
MSM's stage B should switch to it.

Usage: python tools/probe_dma_gather.py [K_rows_log2] [BLK]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

lgK = int(sys.argv[1]) if len(sys.argv) > 1 else 22
BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
n = 1 << 20
K = 1 << lgK
NL = 16

rng = np.random.default_rng(11)
tbl = jnp.asarray(
    rng.integers(0, 2**32, size=(n, NL), dtype=np.uint64).astype(np.uint32)
)
idx = jnp.asarray(rng.integers(0, n, size=(K,), dtype=np.int64)
                  .astype(np.int32))
print(f"K={K/1e6:.1f}M rows BLK={BLK}", flush=True)


def kern(idx_ref, tbl_ref, out_ref, sem):
    i = pl.program_id(0)
    base = i * BLK

    def issue(j, _):
        k = idx_ref[j]
        pltpu.make_async_copy(
            tbl_ref.at[k], out_ref.at[base + j], sem
        ).start()
        return 0

    jax.lax.fori_loop(0, BLK, issue, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            tbl_ref.at[0], out_ref.at[base], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, BLK, drain, 0)


@partial(jax.jit, static_argnums=())
def dma_gather(tbl, idx):
    return pl.pallas_call(
        kern,
        grid=(K // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((K, NL), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(idx, tbl)


out = dma_gather(tbl, idx)
np.asarray(out[0])
# correctness spot check
chk = np.asarray(out[:64])
want = np.asarray(tbl)[np.asarray(idx[:64])]
assert (chk == want).all(), "DMA gather wrong"
t0 = time.time()
for _ in range(5):
    np.asarray(out[0])
rpc = (time.time() - t0) / 5
print(f"(rpc {rpc*1000:.1f} ms)", flush=True)
iters = 6
t0 = time.time()
for _ in range(iters):
    out = dma_gather(tbl, idx)
np.asarray(out[0])
dt = (time.time() - t0 - rpc) / iters
print(f"pallas DMA gather: {dt*1000:.1f} ms  {dt/K*1e9:.2f} ns/row",
      flush=True)
