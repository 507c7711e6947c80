"""Multi-chip sharded MSM on the virtual 8-device CPU mesh."""

import random

import jax
import pytest

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.parallel.mesh import make_mesh
from ark_bulletproofs_tpu.parallel.msm import msm_sharded


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
@pytest.mark.heavy
def test_sharded_msm_matches_host():
    curve = curves.secq256k1
    mesh = make_mesh(8)
    rng = ChaChaRng(bytes([21]) + bytes(31))
    r2 = random.Random(2)
    n = 16
    pts = [curve.rand(rng) for _ in range(n)]
    ks = [r2.randrange(curve.fr.p) for _ in range(n)]
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
@pytest.mark.heavy
def test_graft_entry_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
