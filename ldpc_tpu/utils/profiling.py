"""Tracing / profiling helpers (SURVEY.md §5).

The reference's only tracing is per-trial wall-clock around ``decode()``
(``experiment.h:100-103``). TPU-native equivalents:

* :func:`trace` — context manager around any region, emitting a
  ``jax.profiler`` trace (viewable in XProf/TensorBoard) when a directory is
  given, else a no-op;
* :class:`Timer` — wall-clock section timing with ``block_until_ready``
  semantics for honest device timing.
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace of the enclosed region when trace_dir is set."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class Timer:
    """Accumulating wall-clock timer; ``stop`` blocks on device work."""

    def __init__(self):
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, *arrays):
        if arrays:
            jax.block_until_ready(arrays)
        self.total += time.perf_counter() - self._t0
        self._t0 = None
        return self.total

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
