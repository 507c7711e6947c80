"""Decompose the large-IPA verify regression (VERDICT r3 weak #2).

ipa_verify_n65536 went 1.671 s -> 3.326 s when the verify mega-MSM
switched from pad-to-2^18 to the ragged split (2^17 staged chunk +
1024-wide tail + device add). This probe times each candidate MSM
shape on hardware, then the full verify, so the slow stage is measured
instead of guessed.

Usage: python tools/probe_ipa_verify.py [log_n=16]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, iters=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log_n
    terms = 2 * n + 2 * log_n + 1

    from ark_bulletproofs_tpu import curves
    from ark_bulletproofs_tpu.generators import GeneratorsChain
    from ark_bulletproofs_tpu.ops import curve as dc
    from ark_bulletproofs_tpu.ops import msm2
    from ark_bulletproofs_tpu.ops import msm as dmsm
    from ark_bulletproofs_tpu.ops.limbs import ints_to_limbs
    from ark_bulletproofs_tpu.parallel.msm import msm_device_ragged

    curve = curves.secq256k1
    spec = dc.spec_for(curve)
    rng = random.Random(5)

    print(f"verify mega-MSM terms at n=2^{log_n}: {terms}", flush=True)
    t0 = time.time()
    pts = GeneratorsChain(curve, b"probe-ipa-verify").take(terms)
    print(f"gens ready ({time.time()-t0:.0f}s)", flush=True)
    ks = [rng.randrange(curve.fr.p) for _ in range(terms)]
    X, Y, inf = dc.affine_to_device(curve, pts)
    X, Y, inf = (jax.device_put(np.asarray(a)) for a in (X, Y, inf))
    scal = jax.device_put(ints_to_limbs(ks))

    # 1. ragged driver (the current production path)
    timed("ragged (2^17 staged + 1024 tail + add)",
          lambda: msm_device_ragged(spec, X, Y, inf, scal))

    # 2. pad to 2^18, one staged program (the round-2 behavior)
    m = 1 << (log_n + 2)
    pad = m - terms
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    Yp = jnp.pad(Y, ((0, pad), (0, 0)))
    infp = jnp.pad(inf, (0, pad), constant_values=True)
    sp = jnp.pad(scal, ((0, pad), (0, 0)))
    Xp, Yp, infp, sp = (jax.device_put(a) for a in (Xp, Yp, infp, sp))
    timed(f"padded 2^{log_n+2} staged c={msm2.window_bits(m)}",
          lambda: msm2.msm2_device_jac(
              spec, msm2.window_bits(m), Xp, Yp, infp, sp))

    # 3. the pieces of the ragged path, individually
    h = 1 << (log_n + 1)
    timed(f"chunk 2^{log_n+1} staged c={msm2.window_bits(h)}",
          lambda: msm2.msm2_device_jac(
              spec, msm2.window_bits(h), X[:h], Y[:h], inf[:h], scal[:h]))
    timed(f"chunk 2^{log_n+1} fused  c={msm2.window_bits(h)}",
          lambda: msm2.msm2_device(
              spec, msm2.window_bits(h), X[:h], Y[:h], inf[:h], scal[:h]))
    rem = terms - h
    mt = 1024
    padt = mt - rem
    timed("tail 1024 v2 fused",
          lambda: msm2.msm2_device_jac(
              spec, msm2.window_bits(mt),
              jnp.pad(X[h:], ((0, padt), (0, 0))),
              jnp.pad(Y[h:], ((0, padt), (0, 0))),
              jnp.pad(inf[h:], (0, padt), constant_values=True),
              jnp.pad(scal[h:], ((0, padt), (0, 0)))))
    # alternative window choices for the big chunk
    for c in (11, 12):
        timed(f"chunk 2^{log_n+1} staged c={c}",
              lambda c=c: msm2.msm2_device_jac(
                  spec, c, X[:h], Y[:h], inf[:h], scal[:h]))


if __name__ == "__main__":
    main()
