"""Lightweight phase timers + JAX profiler hooks.

The reference ships no tracing (SURVEY.md §5); for a TPU framework the
useful observability is (a) wall-clock per protocol phase with explicit
device synchronization, and (b) on-demand XLA traces.

Usage:
    from ark_bulletproofs_tpu.utils.profiling import phase, report, xla_trace

    with phase("msm:A_I1"):
        ...
    print(report())

    with xla_trace("/tmp/trace"):   # view in TensorBoard / Perfetto
        ...
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_TIMES: dict[str, list[float]] = defaultdict(list)
_ENABLED = True


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def reset() -> None:
    _TIMES.clear()


@contextlib.contextmanager
def phase(name: str, sync: bool = False):
    """Time a protocol phase; sync=True blocks on all device work first."""
    if not _ENABLED:
        yield
        return
    if sync:
        _block()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            _block()
        _TIMES[name].append(time.perf_counter() - t0)


def _block() -> None:
    try:
        import jax

        (jax.device_put(0) + 0).block_until_ready()
    except Exception:
        pass


def report() -> str:
    lines = []
    for name in sorted(_TIMES):
        ts = _TIMES[name]
        lines.append(
            f"{name:40s} n={len(ts):4d} total={sum(ts)*1e3:9.1f} ms "
            f"mean={sum(ts)/len(ts)*1e3:8.2f} ms"
        )
    return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/TPU profiler trace (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
