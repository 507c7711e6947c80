"""Minimized-repro hunt for the XLA:CPU accumulated-compile SIGSEGV.

Round-4 finding (docs/STATUS.md): jax 0.9.0's XLA:CPU backend segfaults
inside backend_compile_and_load once enough compiled executables
accumulate in ONE process (reproduced 5/5 on single-process full-suite
runs; crash site roams across whichever mesh-adjacent compile crosses
the threshold; not flag-dependent). The test suite mitigates with
per-file pytest-xdist workers.

This script tries to reproduce WITHOUT the test suite: it compiles K
distinct programs of a chosen family in one process and exits 0 if no
crash (a SIGSEGV shows as returncode -11 to the parent).

  python tools/repro_xla_cpu_segv.py <family> <K>
    family = mul    : jitted 256-bit Montgomery mul per distinct width
             add    : jitted RCB complete projective add per width
             mixed  : alternate mul/add/double families

Run under a driver that bisects K, e.g.:
  for K in 50 100 200 400; do
    python tools/repro_xla_cpu_segv.py mul $K; echo "K=$K rc=$?";
  done
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_DEV = "8" if (len(sys.argv) > 1 and sys.argv[1] == "mesh") else "1"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_DEV} "
    "--xla_disable_hlo_passes=fusion"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df
from ark_bulletproofs_tpu.ops import proj as dpj

spec = dc.spec_for(curves.secq256k1)
fam = sys.argv[1] if len(sys.argv) > 1 else "mul"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100

if fam == "mesh":
    # mesh-adjacent family: the round-4 suite crashes clustered around
    # shard_map compiles on the 8-device CPU mesh
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(jax.devices(), ("d",))
    for i in range(K):
        w = 8 * (8 + i)
        x = jnp.zeros((w, 16), jnp.uint32)

        def body(a, b):
            return df.mont_mul(spec.fq, a, b)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("d"), P("d")),
            out_specs=P("d"),
        ))
        f(x, x).block_until_ready()
        g = jax.jit(lambda a, b: df.mont_mul(spec.fq, a, b))
        g(x, x).block_until_ready()
        if (i + 1) % 10 == 0:
            print(f"{i + 1} mesh program pairs compiled ok", flush=True)
else:
    for i in range(K):
        w = 8 + i  # distinct static width -> distinct executable
        x = jnp.zeros((w, 16), jnp.uint32)
        if fam == "mul" or (fam == "mixed" and i % 3 == 0):
            f = jax.jit(lambda a, b: df.mont_mul(spec.fq, a, b))
            f(x, x).block_until_ready()
        elif fam == "add" or (fam == "mixed" and i % 3 == 1):
            f = jax.jit(lambda P, Q: dpj._add_xla(spec, P, Q))
            f((x, x, x), (x, x, x))[0].block_until_ready()
        else:
            f = jax.jit(lambda P: dpj._double_xla(spec, P))
            f((x, x, x))[0].block_until_ready()
        if (i + 1) % 10 == 0:
            print(f"{i + 1} programs compiled ok", flush=True)
print("no crash", flush=True)
