"""Hardware probe: v2/v1 MSM `base_map` indirection vs exact host math.

Small sizes; validates the composed sort-order gather (ops/msm2.py::
_stage_gather, ops/msm.py::msm_impl) on the real backend before the
IPA compact rounds rely on it. Run: python tools/probe_basemap.py
"""

import random
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.generators import GeneratorsChain
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm as dmsm
from ark_bulletproofs_tpu.ops import msm2, proj as dpj
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

curve = curves.secq256k1
spec = dc.spec_for(curve)
prng = random.Random(11)

n_table, n, B = 512, 256, 3
pts = GeneratorsChain(curve, b"bmprobe").take(n_table)
X, Y, inf = dc.affine_to_device(curve, pts)
X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))

bm = np.stack(
    [
        np.asarray(
            [prng.randrange(n_table) for _ in range(n)], np.int32
        )
        for _ in range(B)
    ]
)
ks = [[prng.randrange(curve.fr.p) for _ in range(n)] for _ in range(B)]
scal = ints_to_limbs([k for row in ks for k in row]).reshape(B, n, 16)

want = [
    curve.msm([pts[j] for j in bm[b]], ks[b]) for b in range(B)
]

platform = jax.devices()[0].platform
print("platform:", platform)

# v2 (TPU only)
if platform != "cpu":
    out = msm2.msm2_device(
        spec, msm2.window_bits(n), X, Y, inf, scal, jax.device_put(bm)
    )
    got = [dpj.point_to_host(curve, tuple(a[b] for a in out)) for b in range(B)]
    print("v2 batched base_map:", "OK" if got == want else "MISMATCH")
    assert got == want

# v1
out = dmsm.msm_device(
    spec, 4, X, Y, inf, scal, None, jax.device_put(bm)
)
got = [dc.point_to_host(curve, tuple(a[b] for a in out)) for b in range(B)]
print("v1 batched base_map:", "OK" if got == want else "MISMATCH")
assert got == want

# single-set
out1 = dmsm.msm_device(
    spec, 4, X, Y, inf, scal[0], None, jax.device_put(bm[:1])
)
got1 = dc.point_to_host(curve, out1)
print("v1 single base_map:", "OK" if got1 == want[0] else "MISMATCH")
assert got1 == want[0]
print("all base_map probes OK")
