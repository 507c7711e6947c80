"""Test harness config: force JAX onto a virtual 8-device CPU mesh.

Device-path tests (ops/, parallel/) run against CPU-emulated TPUs so the
suite is hermetic; the real-chip numbers come from bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the limb-arithmetic graphs are large and
# dominate test wall-clock on recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/abtpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
