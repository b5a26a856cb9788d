"""Profiling: JAX profiler traces + throughput metrics.

First-class observability the reference lacked (SURVEY.md §5: the reference
has only a wall-clock context manager and tqdm). Usage:

    with trace("/tmp/rehrseg_trace"):
        state, metrics = train_step(...)

then inspect with TensorBoard / xprof, or use `annotate` to name regions.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return stats or {}
