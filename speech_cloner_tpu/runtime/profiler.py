"""Profiling hooks: jax.profiler traces + per-step timing.

The reference had no tracing at all (SURVEY.md §5). These helpers wrap
train/inference loops with on-demand XLA traces viewable in
TensorBoard/Perfetto, and annotate named regions.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/scl_trace", enabled: bool = True):
    """Capture an XLA profile for the enclosed region."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Best-effort per-device memory summary."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                           if k in s}
        except Exception:
            out[str(d)] = {}
    return out
