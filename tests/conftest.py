"""Test harness config: force JAX onto a virtual 8-device CPU mesh.

Device-path tests (ops/, parallel/) run against CPU-emulated TPUs so the
suite is hermetic; the real-chip numbers come from bench.py.
"""

import os

# The ambient environment carries JAX_PLATFORMS=axon (the tunneled TPU)
# and sitecustomize PRE-IMPORTS jax, so environment variables alone are
# too late. Tests must be hermetic on CPU (concurrent processes sharing
# the single TPU tunnel hang), so override through jax.config, which is
# still mutable until the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The 256-bit group-law subgraphs take ~30 s each through XLA:CPU's
# fusion pass vs ~8 s without it (measured); the suite is correctness-
# bound, not perf-bound, so trade runtime for a ~4x faster compile.
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

# NOTE: do not enable JAX_COMPILATION_CACHE_DIR here — the persistent
# cache deadlocks array reads under this JAX build (observed with the
# axon PJRT plugin present). Compile cost is managed by sharing shapes
# across test cases instead.
