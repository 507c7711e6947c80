"""Multi-chip sharded MSM on the virtual 8-device CPU mesh.

The compile-light (bit-serial) sharded path runs in the default suite —
it proves the shard_map sharding, the per-device partial reduction, and
bit-exactness against the host Pippenger. The full sharded Pippenger
shares the identical sharding structure but costs minutes of XLA:CPU
compile, so it is exercised under `-m heavy`.
"""

import random

import jax
import pytest

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.parallel.mesh import make_mesh
from ark_bulletproofs_tpu.parallel.msm import msm_sharded, msm_sharded_serial


def _inputs(n, seed=21):
    curve = curves.secq256k1
    rng = ChaChaRng(bytes([seed]) + bytes(31))
    r2 = random.Random(2)
    pts = [curve.rand(rng) for _ in range(n)]
    ks = [r2.randrange(curve.fr.p) for _ in range(n)]
    return curve, pts, ks


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs an 8-device mesh")
def test_sharded_serial_msm_matches_host():
    # n=64 matches dryrun_multichip's shapes so the graft-entry test in
    # this same process reuses the compiled program.
    curve, pts, ks = _inputs(64)
    mesh = make_mesh(8)
    got = msm_sharded_serial(curve, pts, ks, mesh)
    assert got == curve.msm(pts, ks)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
@pytest.mark.heavy
def test_sharded_msm_matches_host():
    curve, pts, ks = _inputs(16)
    mesh = make_mesh(8)
    got = msm_sharded(curve, pts, ks, mesh)
    assert got == curve.msm(pts, ks)


@pytest.mark.heavy
def test_graft_entry_single_chip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_entry_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
