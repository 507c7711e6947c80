"""Multi-host (multi-process) mesh: the DCN scaling path.

Drives a REAL 2-process JAX job on this machine (gloo CPU collectives
standing in for DCN): each process owns 4 virtual devices and one
contiguous slice of the points, the sharded MSM runs over the 8-device
GLOBAL mesh, and both processes must agree with the single-host
Pippenger. This is the same program a v5p multi-host slice runs —
parallel/multihost.py only swaps the transport.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_msm_matches_host():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        " --xla_disable_hlo_passes=fusion"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for pr in procs:
        out, err = pr.communicate(timeout=1140)
        outs.append((pr.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert f"MULTIHOST_OK proc={i} mesh=8" in out, (
            f"proc {i} rc={rc}\n{out[-2000:]}\n{err[-2000:]}"
        )
