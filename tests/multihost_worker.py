"""Worker for tests/test_multihost.py: one process of a 2-process CPU
mesh (gloo collectives — the DCN stand-in). Launched by the test, not
by pytest collection."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    port, proc_id, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from ark_bulletproofs_tpu.parallel import multihost

    assert multihost.initialize(
        coordinator=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs

    from ark_bulletproofs_tpu.curves import secq256k1 as C
    from ark_bulletproofs_tpu.generators import GeneratorsChain
    from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng

    n = 64
    # Owner-computes: generate ONLY this host's contiguous slice via
    # fast_forward (the full table is never materialized per host).
    start, stop = multihost._host_range(n)
    chain = GeneratorsChain(C, b"multihost-msm").fast_forward(start)
    local_pts = chain.take(stop - start)
    rng = ChaChaRng(bytes([7]) * 32)
    ks = [C.fr.rand(rng) for _ in range(n)]
    local_ks = ks[start:stop]

    mesh = multihost.global_mesh()
    got = multihost.msm_multihost(C, local_pts, local_ks, n, mesh,
                                  kind="serial")

    # Every process can afford the full reference at this size.
    full = GeneratorsChain(C, b"multihost-msm").take(n)
    want = C.msm(full, ks)
    assert got == want, f"proc {proc_id}: multihost MSM != host Pippenger"
    print(f"MULTIHOST_OK proc={proc_id} mesh={mesh.devices.size}",
          flush=True)


if __name__ == "__main__":
    main()
