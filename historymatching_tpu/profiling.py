"""Profiling / timing instrumentation.

The reference's only instrumentation is tqdm progress bars (SURVEY.md §5).
Here: a `jax.profiler` trace context for real TPU traces (view in
TensorBoard / Perfetto), and a wall-clock timer with proper device
synchronization and compile/steady-state separation.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/jax-trace"):
    """Capture a device trace: `with profiling.trace("dir"): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, repeats=3, **kwargs):
    """Time `fn(*args)` with block_until_ready.

    Returns (best_seconds, first_call_seconds): the first call includes
    compilation; the best of `repeats` subsequent calls is steady-state.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, first
