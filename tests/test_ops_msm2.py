"""v2 mega-kernel MSM (ops/msm2.py) vs the exact host Pippenger.

TPU-only: in Pallas interpret mode (the CPU fallback) the grid of the
mega-kernels unrolls into the XLA graph — hundreds of group-law bodies
— and XLA:CPU takes >25 min to compile it (measured; rc=124 at 1500 s),
so these cases skip off-TPU. On-hardware coverage also comes from
`bench.py`, which self-checks the v2 result against the exact host
Pippenger before reporting any number. Replaces
`ark_ec::VariableBaseMSM::msm` (reference src/inner_product_proof.rs:104,
src/r1cs/verifier.rs:574).
"""

import random

import jax
import numpy as np
import pytest

from ark_bulletproofs_tpu import curves

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(
        jax.devices()[0].platform == "cpu",
        reason="msm2 interpret-mode XLA:CPU compile exceeds 25 min; "
        "covered on TPU by bench.py self-check + probe logs",
    ),
]
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import msm2
from ark_bulletproofs_tpu.ops import proj as dpj
from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

N = 1024
C = 8


def _inputs(curve, seed=42):
    rng = ChaChaRng(bytes([5]) + bytes(31))
    prng = random.Random(seed)
    base = [curve.rand(rng) for _ in range(64)]
    pts = [base[i % 64] for i in range(N)]
    ks = [prng.randrange(curve.fr.p) for _ in range(N)]
    pts[3] = None  # identity base
    ks[7] = 0  # zero scalar
    X, Y, inf = dc.affine_to_device(curve, pts)
    return pts, ks, X, Y, np.asarray(inf)


def test_msm2_single_matches_host():
    curve = curves.secq256k1
    spec = dc.spec_for(curve)
    pts, ks, X, Y, inf = _inputs(curve)
    out = msm2.msm2_device(spec, C, X, Y, inf, ints_to_limbs(ks))
    assert dpj.point_to_host(curve, out) == curve.msm(pts, ks)


def test_msm2_batched_and_jacobian_out():
    curve = curves.secq256k1
    spec = dc.spec_for(curve)
    pts, ks, X, Y, inf = _inputs(curve)
    prng = random.Random(7)
    ks2 = [prng.randrange(curve.fr.p) for _ in range(N)]
    scal = ints_to_limbs(ks + ks2).reshape(2, N, 16)
    out = msm2.msm2_device(spec, C, X, Y, inf, scal)
    got = [
        dpj.point_to_host(curve, tuple(a[b] for a in out)) for b in (0, 1)
    ]
    assert got[0] == curve.msm(pts, ks)
    assert got[1] == curve.msm(pts, ks2)
    # jacobian-out wrapper (the protocol routing contract)
    outj = msm2.msm2_device_jac(spec, C, X, Y, inf, ints_to_limbs(ks))
    assert dc.point_to_host(curve, outj) == curve.msm(pts, ks)
