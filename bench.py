"""Headline benchmark: device MSM throughput (points/s) on secq256k1.

Prints ONE JSON line. The metric mirrors BASELINE.md's north star
(MSM points/s/chip); `vs_baseline` compares against a single-thread
arkworks-CPU Pippenger estimate for secq256k1 (the reference publishes
no numbers — BASELINE.md — so the denominator is the commonly measured
~8e5 points/s for ark-ec 0.4 Fp256 MSM on one modern x86 core, recorded
here as a fixed constant so rounds stay comparable).

Inputs are FULLY random: distinct generator-chain points (the same
SHA3/ChaCha chain the protocol uses) and unique uniform scalars — no
repeated points/scalars that would compress the sort or hit doubling
fast paths. Points and the exact host-Pippenger reference result are
cached in benches/.bench_points_*.npz after the first run. The run
self-checks the device result against the host reference before any
timing is reported, and every timed iteration blocks to completion
(through the axon tunnel that includes ~29 ms of RPC latency per call,
so the number is conservative vs bare-metal).

Size: ABTPU_BENCH_LOGN (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_CPU_MSM_PPS = 800_000.0
CACHE = os.path.join(os.path.dirname(__file__), "benches")


def _measured_cpu_pps(n: int) -> float | None:
    """The measured single-core C++ Pippenger denominator for this n
    (benches/bench_cpu_pippenger.py), if recorded. Kept alongside the
    800k folklore constant: the constant stays for cross-round
    comparability, the measurement (VERDICT r2 missing #5) says what one
    core of THIS machine actually does on the same workload."""
    path = os.path.join(CACHE, "results", "cpu_pippenger.jsonl")
    best = None
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("metric") == f"cpu_pippenger_secq256k1_n{n}":
                    best = rec["value"]
    except OSError:
        return None
    return best


def _sol_madd_ns(spec) -> float | None:
    """Calibrate the floor: BEST observed ns/mixed-add of the scan
    kernel that does the MSM's mandatory work (W*n madds).

    Model (docs/BENCH_MATRIX.md): floor_seconds = W * n * madd_ns_best.
    Every window of every point passes through `suffix_madd_scan`
    serially, so the MSM cannot run its madds faster than the kernel's
    own best measured rate — sol_pct <= 100 by construction. Round 3's
    instrument broke in BOTH directions: single blocking calls of a
    ~30 ms probe read 33-37 ns/madd (dispatch+RPC-bound, floor too
    high -> 115% SoL), and a one-shot 6.77 ns/mul Pallas-chain probe
    read 418%. This probe (a) sizes the call so kernel math dominates,
    (b) issues iters back-to-back and blocks ONCE (pipelined, matching
    how the staged MSM itself is timed), (c) takes the MIN over
    repeats. Best observed 7.2 ns/madd ~= 0.65 ns per mont-mul over 11
    muls/madd — right at the VPU's analytic op-count ceiling
    (~2200 u32 lane-ops/mul at ~3.9e12 ops/s), i.e. the calibration is
    itself at silicon speed-of-light, not an artifact. Returns None
    off-TPU.
    """
    import jax
    import numpy as np

    if jax.devices()[0].platform == "cpu":
        return None
    import time as _t

    from ark_bulletproofs_tpu import curves
    from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import kernels2 as k2
    from ark_bulletproofs_tpu.ops.limbs import N_LIMBS

    curve = curves.secq256k1
    rng = np.random.default_rng(7)
    # 16.8M madds/call ≈ 120 ms of kernel math at the ~7.2 ns ceiling:
    # 4x the ~29 ms tunnel RPC even unpipelined.
    R, L = 256, 64 * 1024
    crng = ChaChaRng(bytes([9]) + bytes(31))
    pts = [curve.rand(crng) for _ in range(256)]
    X, Y, _ = dc.affine_to_device(curve, pts)
    X, Y = np.asarray(X), np.asarray(Y)
    idx = rng.integers(0, 256, size=R * L)
    gx = X[idx].reshape(R, L, N_LIMBS)
    gy = Y[idx].reshape(R, L, N_LIMBS)
    gxy = jax.device_put(np.swapaxes(gx | (gy << 16), 1, 2).copy())
    jax.block_until_ready(k2.suffix_madd_scan(spec, gxy))
    best = None
    iters = 4
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(iters):
            out = k2.suffix_madd_scan(spec, gxy)
        jax.block_until_ready(out)
        ns = (_t.perf_counter() - t0) / iters / (R * L) * 1e9
        best = ns if best is None else min(best, ns)
    return best


def _probe_backend(timeout: float = 240.0):
    """Initialize the default JAX backend in a THROWAWAY subprocess.

    The axon relay (the only path to the TPU) fails by HANGING, not by
    erroring: if its process dies, every `jax.devices()` call in every
    process blocks forever (observed 2026-08-17). Probing in a killable
    subprocess lets this bench fall back to the CPU backend and still
    emit its one JSON line instead of hanging the round driver. A
    healthy backend answers in seconds, so the timeout only fires when
    the tunnel is actually wedged.
    """
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT', jax.devices()[0].platform)"],
            timeout=timeout, capture_output=True, text=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("PLAT "):
                return line.split(" ", 1)[1]
    except subprocess.TimeoutExpired:
        pass
    return None


def _workload(curve, n, ks):
    """n distinct random points + the exact MSM result (disk-cached)."""
    import numpy as np

    path = os.path.join(CACHE, f".bench_points_{curve.name}_{n}.npz")
    if os.path.exists(path):
        d = np.load(path)
        pts = [
            (int.from_bytes(x.tobytes(), "little"),
             int.from_bytes(y.tobytes(), "little"))
            for x, y in zip(d["xs"], d["ys"])
        ]
        if "wx" in d:
            want = (
                int.from_bytes(d["wx"].tobytes(), "little"),
                int.from_bytes(d["wy"].tobytes(), "little"),
            )
            return pts, want
    else:
        from ark_bulletproofs_tpu.generators import GeneratorsChain

        pts = GeneratorsChain(curve, b"bench").take(n)
    # Exact reference result: the single-core C++ Pippenger when available
    # (independently validated vs the pure-Python Pippenger in
    # tests/test_native_msm.py; ~100x faster at 2^20), else pure Python.
    want = None
    if curve.name == "secq256k1":
        from ark_bulletproofs_tpu import native

        jac = native.cpu_pippenger_native(pts, ks)
        if jac is not None:
            X, Y, Z = jac
            zi = pow(Z, -1, curve.fq.p)
            want = (X * zi * zi % curve.fq.p, Y * zi * zi * zi % curve.fq.p)
    if want is None:
        want = curve.msm(pts, ks)
    xs = np.stack(
        [np.frombuffer(P[0].to_bytes(32, "little"), np.uint8) for P in pts]
    )
    ys = np.stack(
        [np.frombuffer(P[1].to_bytes(32, "little"), np.uint8) for P in pts]
    )
    os.makedirs(CACHE, exist_ok=True)
    np.savez_compressed(
        path, xs=xs, ys=ys,
        wx=np.frombuffer(want[0].to_bytes(32, "little"), np.uint8),
        wy=np.frombuffer(want[1].to_bytes(32, "little"), np.uint8),
    )
    return pts, want


def main() -> None:
    import random

    import numpy as np

    tunnel_down = False
    if _probe_backend() is None:
        # Relay wedged: flip THIS process to CPU before first backend
        # use (env vars are too late — jax is pre-imported by the axon
        # sitecustomize) and report the degraded run honestly.
        tunnel_down = True
        # XLA:CPU's fusion pass is superlinear on the 256-bit group-law
        # subgraphs (~30 s/instantiation vs ~8 s without); flags are
        # still unparsed because no backend has initialized yet.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_disable_hlo_passes" not in flags:
            flags = (flags + " --xla_disable_hlo_passes=fusion").strip()
        os.environ["XLA_FLAGS"] = flags
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from ark_bulletproofs_tpu import curves
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import msm as dmsm
    from ark_bulletproofs_tpu.ops import msm2, proj as dpj
    from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs

    curve = curves.secq256k1
    spec = dc.spec_for(curve)

    platform = jax.devices()[0].platform
    # BASELINE.md's north star is points/s/chip at n = 2^20 — that is the
    # default headline on real hardware (the workload cache makes the
    # host side free); CPU fallback runs stay small.
    default_logn = 20 if platform != "cpu" else 10
    log_n = int(os.environ.get("ABTPU_BENCH_LOGN", default_logn))
    n = 1 << log_n

    prng = random.Random(2024)
    ks = [prng.randrange(curve.fr.p) for _ in range(n)]
    pts, want = _workload(curve, n, ks)

    X, Y, inf = dc.affine_to_device(curve, pts)
    scal = ints_to_limbs(ks)
    # Pin inputs on device: the axon tunnel's host<->device link is slow,
    # and the protocol keeps bases resident in real use.
    X, Y, inf, scal = (
        jax.device_put(np.asarray(a)) for a in (X, Y, inf, scal)
    )

    use_v2 = platform != "cpu"
    if use_v2:
        c = msm2.window_bits(n)
        # size-routed: staged chain above 2^17, fused single program below
        run = lambda: msm2.msm2_best(spec, c, X, Y, inf, scal)  # noqa: E731
        to_host = dpj.point_to_host
    else:
        c = dmsm._window_bits(n)
        run = lambda: dmsm.msm_device(spec, c, X, Y, inf, scal)  # noqa: E731
        to_host = dc.point_to_host

    # compile + self-check against the exact host Pippenger
    v2_failed = False
    out = run()
    jax.block_until_ready(out)
    got = to_host(curve, out)
    if got != want and use_v2:
        # v2 mega-kernel self-check failed: fall back to the v1 path
        # (independently hardware-validated) and SAY SO in the output
        # rather than producing no number at all.
        v2_failed = True
        use_v2 = False
        c = dmsm._window_bits(n)
        run = lambda: dmsm.msm_device(spec, c, X, Y, inf, scal)  # noqa: E731
        to_host = dc.point_to_host
        out = run()
        jax.block_until_ready(out)
        got = to_host(curve, out)
    if got != want:
        print(
            json.dumps(
                {
                    "metric": f"msm_secq256k1_n{n}_{platform}",
                    "value": 0.0,
                    "unit": "points/s",
                    "vs_baseline": 0.0,
                    "error": "device result mismatch vs host Pippenger",
                }
            )
        )
        sys.exit(1)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    rec = {
        "metric": f"msm_secq256k1_n{n}_{platform}",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / REFERENCE_CPU_MSM_PPS, 3),
    }
    cpu_pps = _measured_cpu_pps(n)
    if cpu_pps:
        rec["measured_cpu_pps"] = cpu_pps
        rec["vs_measured_cpu"] = round(pps / cpu_pps, 2)
    # Speed-of-light %: work floor = W*n mixed adds at the madd
    # kernel's own BEST measured rate (model in docs/BENCH_MATRIX.md).
    # Sort, gather, buckets, and Horner are charged as free, and the
    # MSM's madds all run through that same kernel, so the floor is
    # unbeatable and sol_pct <= 100 by construction.
    madd_ns = None if (tunnel_down or v2_failed) else _sol_madd_ns(spec)
    if madd_ns:
        W = -(-256 // c)
        sol_pps = 1e9 / (W * madd_ns)
        rec["sol_pct"] = round(100.0 * pps / sol_pps, 1)
        rec["sol_madd_ns"] = round(madd_ns, 2)
    if tunnel_down:
        rec["tunnel_down"] = True  # TPU relay wedged; CPU fallback run
    if v2_failed:
        rec["v2_selfcheck_failed"] = True  # timed the v1 path instead
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
