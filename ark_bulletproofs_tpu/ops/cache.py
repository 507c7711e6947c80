"""Device-resident base-table cache for generator tables.

Generator tables (BulletproofGens) are deterministic, reusable artifacts;
converting their points to device limb form costs O(n) host big-int work
and a host->device transfer, so it must happen once per table, not per
proof. Keyed weakly on the table object (capacity-aware), mirroring how
the reference treats gens as precomputed parameters
(reference src/generators.rs:149-304).
"""

from __future__ import annotations

import weakref

import jax
import numpy as np

from . import curve as dc

_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def bp_table(bp_gens, curve, n: int):
    """(X, Y, inf) device arrays for share-0 [G(n) | H(n)] (2n points)."""
    per = _CACHE.setdefault(bp_gens, {})
    key = (curve.name, n)
    hit = per.get(key)
    if hit is not None:
        return hit
    gens = bp_gens.share(0)
    pts = gens.G(n) + gens.H(n)
    X, Y, inf = dc.affine_to_device(curve, pts)
    entry = (
        jax.device_put(X),
        jax.device_put(Y),
        jax.device_put(np.asarray(inf)),
    )
    per[key] = entry
    return entry


def pc_pair(pc_gens, curve):
    """(X, Y, inf) for [B, B_blinding]."""
    per = _CACHE.setdefault(pc_gens, {})
    key = (curve.name, "pc")
    hit = per.get(key)
    if hit is not None:
        return hit
    X, Y, inf = dc.affine_to_device(curve, [pc_gens.B, pc_gens.B_blinding])
    entry = (
        jax.device_put(X),
        jax.device_put(Y),
        jax.device_put(np.asarray(inf)),
    )
    per[key] = entry
    return entry


def full_table(bp_gens, pc_gens, curve):
    """(X, Y, inf) device arrays for [G(cap) | H(cap) | B | B_blinding]
    at cap = bp_gens.gens_capacity, plus cap — ONE cached upload serving
    every prover phase MSM via base_map row indexing (the phase bases
    are always slices of this table; marshaling + uploading them fresh
    per proof cost ~200 ms/phase through the tunnel)."""
    per = _CACHE.setdefault(bp_gens, {})
    cap = bp_gens.gens_capacity
    key = (curve.name, "full", cap, id(pc_gens))
    hit = per.get(key)
    if hit is not None:
        return hit
    gens = bp_gens.share(0)
    pts = gens.G(cap) + gens.H(cap) + [pc_gens.B, pc_gens.B_blinding]
    X, Y, inf = dc.affine_to_device(curve, pts)
    entry = (
        jax.device_put(X),
        jax.device_put(Y),
        jax.device_put(np.asarray(inf)),
        cap,
    )
    per[key] = entry
    return entry
