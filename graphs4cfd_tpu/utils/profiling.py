"""Tracing and throughput observability.

The reference has no profiling at all (SURVEY §5); here: ``jax.profiler``
trace annotations around graph-build / step / exchange phases, a host-sync
Timer (the remote-TPU tunnel's ``block_until_ready`` returns early — only a
host transfer is a true sync), and an edges/s meter (the headline metric).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op if unavailable)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


def start_trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax
    jax.profiler.stop_trace()


def sync(x) -> float:
    """Force completion of a device computation by transferring one leaf to
    host.  Returns the transferred scalar-ish value for convenience."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


class Timer:
    """Wall-clock timer with true device synchronisation."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.time()
        return self

    def stop(self, device_value=None) -> float:
        if device_value is not None:
            sync(device_value)
        self.elapsed = time.time() - self.t0
        return self.elapsed


class EdgeRateMeter:
    """Accumulates edges processed / wall time → edges/s (headline)."""

    def __init__(self):
        self.edges = 0
        self.seconds = 0.0

    def update(self, num_edges: int, seconds: float):
        self.edges += num_edges
        self.seconds += seconds

    @property
    def rate(self) -> float:
        return self.edges / self.seconds if self.seconds > 0 else 0.0
