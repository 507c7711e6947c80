"""ctypes loader for the native host byte layer (csrc/abtpu_host.cpp).

Builds the shared library on first use if a compiler is available;
callers fall back to the pure-Python implementations when it isn't.
The Python and C++ paths are bit-exact (tests/test_byte_layer.py runs
both), so which one loads is purely a performance matter.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc", "abtpu_host.cpp")
_OUT_DIR = os.path.join(os.path.dirname(__file__), "_build")
_OUT = os.path.join(_OUT_DIR, "libabtpu_host.so")


def _build() -> str | None:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    os.makedirs(_OUT_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _OUT, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _OUT


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("ABTPU_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            L = ctypes.CDLL(path)
            L.abtpu_keccak_f1600.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
            L.abtpu_chacha20_blocks.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint32),
            ]
            L.abtpu_sha3.argtypes = [
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_uint8,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint64,
            ]
            _lib = L
        except Exception:
            _lib = None
        return _lib


def keccak_f1600_native(lanes: list[int]) -> list[int] | None:
    L = lib()
    if L is None:
        return None
    arr = (ctypes.c_uint64 * 25)(*lanes)
    L.abtpu_keccak_f1600(arr)
    return list(arr)


def chacha20_blocks_native(key_words, counter0: int, nblocks: int):
    """Returns a list of 16*nblocks u32 keystream words, or None."""
    L = lib()
    if L is None:
        return None
    key = (ctypes.c_uint32 * 8)(*key_words)
    out = (ctypes.c_uint32 * (16 * nblocks))()
    L.abtpu_chacha20_blocks(key, counter0, nblocks, out)
    return list(out)


def sha3_native(data: bytes, rate: int, domain: int, out_len: int) -> bytes | None:
    L = lib()
    if L is None:
        return None
    out = (ctypes.c_uint8 * out_len)()
    L.abtpu_sha3(data, len(data), rate, domain, out, out_len)
    return bytes(out)
