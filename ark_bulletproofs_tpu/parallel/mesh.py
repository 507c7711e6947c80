"""Device-mesh helpers for multi-chip execution.

The reference has no distributed backend at all (its only parallelism is
rayon inside arkworks, Cargo.toml:76); multi-chip scaling here is a
TPU-native requirement derived from the workload (SURVEY.md §2c): points
and protocol vectors are sharded over a 1-D "data" mesh axis and partial
group sums ride ICI collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
