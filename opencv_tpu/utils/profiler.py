"""Region tracing/profiling (CV_INSTRUMENT_REGION / CV_TRACE analog,
reference core/src/trace.cpp; env-gated like OPENCV_TRACE,
trace.cpp:76-88).

`profile_region` both feeds `jax.profiler.TraceAnnotation` (so regions
show up in Perfetto/XProf device traces) and accumulates host wall-time
per region name. `OPENCV_TPU_TRACE=1` enables wall-time accumulation.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax

_ENABLED = os.environ.get("OPENCV_TPU_TRACE", "0") not in ("0", "")
_TOTALS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def profile_region(name: str):
    """with profile_region("orb.detect"): ... — nestable region marker."""
    with jax.profiler.TraceAnnotation(name):
        if not _ENABLED:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _TOTALS[name] += time.perf_counter() - t0
            _COUNTS[name] += 1


def report() -> dict[str, tuple[float, int]]:
    """{region: (total_seconds, calls)} accumulated so far."""
    return {k: (_TOTALS[k], _COUNTS[k]) for k in sorted(_TOTALS)}


def reset() -> None:
    _TOTALS.clear()
    _COUNTS.clear()


def start_device_trace(logdir: str) -> None:
    """Begin a jax.profiler trace (Perfetto/XProf)."""
    jax.profiler.start_trace(logdir)


def stop_device_trace() -> None:
    jax.profiler.stop_trace()
