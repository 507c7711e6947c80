"""Host <-> device limb conversion for 256-bit field elements.

Device representation: little-endian base-2^16 limbs held in uint32 lanes,
shape (..., N_LIMBS). 16-bit limbs keep every partial product a_i * b_j
below 2^32 (exact in uint32 lane arithmetic) and let column sums of a
schoolbook convolution stay below 2^22 — branch-free carry handling with
no 64-bit emulation, which is what the TPU VPU wants.

The 16-bit limb size also aligns with Pippenger windows: a 256-bit scalar's
w-th 16-bit window digit IS its w-th limb (and 8/4-bit windows are byte /
nibble views of the limbs), so digit extraction is free.
"""

from __future__ import annotations

import numpy as np

N_LIMBS = 16
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)


def int_to_limbs(x: int) -> np.ndarray:
    """One 256-bit int -> (N_LIMBS,) uint32 array of 16-bit limbs."""
    out = np.empty(N_LIMBS, dtype=np.uint32)
    for i in range(N_LIMBS):
        out[i] = (x >> (LIMB_BITS * i)) & 0xFFFF
    return out


def ints_to_limbs(xs) -> np.ndarray:
    """List of 256-bit ints -> (len, N_LIMBS) uint32.

    Bulk path: serialize via int.to_bytes then reinterpret, which is far
    faster than per-limb Python shifts for large n (the MSM hot path
    converts up to 2^20 scalars per call).
    """
    n = len(xs)
    buf = b"".join(x.to_bytes(32, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(n, N_LIMBS)
    return u16.astype(np.uint32)


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.uint64)
    x = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[i])
    return x


def limbs_to_ints(arr) -> list[int]:
    a = np.asarray(arr, dtype=np.uint32)
    if a.ndim == 1:
        return [limbs_to_int(a)]
    u16 = a.astype("<u2").tobytes()
    n = a.shape[0]
    return [
        int.from_bytes(u16[32 * i: 32 * (i + 1)], "little") for i in range(n)
    ]
