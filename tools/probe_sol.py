"""Speed-of-light calibration probe (run on TPU hardware).

Measures the framework's two compute ceilings so bench numbers can be
quoted as a % of speed-of-light:

  1. mont-mul ceiling: `mont_mul_tiled` (Pallas 16x16 CIOS) ns/element
     at large lane counts — the VPU u32-MAC-bound floor for ANY 256-bit
     field work on this chip.
  2. madd ceiling: `suffix_madd_scan` ns/mixed-add (RCB complete madd,
     running point in registers) — the floor of the Pippenger scan,
     which is W*n madds for an n-point MSM with ceil(256/c) windows.

Then prints the implied MSM speed-of-light for n in {2^16, 2^20} and
what fraction of it the measured bench numbers hit.

Usage: python tools/probe_sol.py [lanes]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import numpy as np  # noqa: E402

from ark_bulletproofs_tpu import curves  # noqa: E402
from ark_bulletproofs_tpu.fields import secq256k1_fq  # noqa: E402
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng  # noqa: E402
from ark_bulletproofs_tpu.ops import curve as dc  # noqa: E402
from ark_bulletproofs_tpu.ops import field as df  # noqa: E402
from ark_bulletproofs_tpu.ops import kernels as kk  # noqa: E402
from ark_bulletproofs_tpu.ops import kernels2 as k2  # noqa: E402
from ark_bulletproofs_tpu.ops.limbs import N_LIMBS, ints_to_limbs  # noqa: E402

lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
print("platform:", jax.devices()[0].platform, "lanes:", lanes, flush=True)

fs = df.spec_for(secq256k1_fq)
curve = curves.secq256k1
spec = dc.spec_for(curve)
rng = np.random.default_rng(7)
p = secq256k1_fq.p

a = ints_to_limbs([int.from_bytes(rng.bytes(31), "little") for _ in range(lanes)])
b = ints_to_limbs([int.from_bytes(rng.bytes(31), "little") for _ in range(lanes)])
a, b = jax.device_put(a), jax.device_put(b)


def timeit(f, iters=10):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# 1. mont mul ceiling
dt = timeit(lambda: kk.mont_mul_tiled(fs, a, b))
mul_ns = dt / lanes * 1e9
print(f"mont_mul_tiled: {dt*1e3:.2f} ms  -> {mul_ns:.2f} ns/elem", flush=True)

# 2. madd ceiling via the scan kernel (R rows over L lanes)
R, L = 16, 16 * 1024
crng = ChaChaRng(bytes([9]) + bytes(31))
pts = [curve.rand(crng) for _ in range(256)]
X, Y, inf = dc.affine_to_device(curve, pts)
X, Y = np.asarray(X), np.asarray(Y)
idx = rng.integers(0, 256, size=R * L)
gx = X[idx].reshape(R, L, N_LIMBS)
gy = Y[idx].reshape(R, L, N_LIMBS)
gxy = np.swapaxes(gx | (gy << 16), 1, 2).copy()
gxy = jax.device_put(gxy)
dt = timeit(lambda: k2.suffix_madd_scan(spec, gxy), iters=5)
madd_ns = dt / (R * L) * 1e9
print(f"suffix_madd_scan ({R}x{L}): {dt*1e3:.2f} ms -> {madd_ns:.2f} ns/madd",
      flush=True)

for lg, c in ((16, 10), (20, 12)):
    n = 1 << lg
    W = -(-256 // c)
    floor_ms = W * n * madd_ns / 1e6
    print(f"n=2^{lg} c={c}: scan floor = {floor_ms:.1f} ms "
          f"-> SoL {n / (floor_ms/1e3):,.0f} pts/s", flush=True)
