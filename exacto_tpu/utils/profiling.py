"""Profiling helpers: wall-clock op timing and jax.profiler traces.

The reference's only timing lives in its repro binary (std::time::Instant,
paper_repro.rs:125-163); here timing and device tracing are first-class
utilities used by bench.py / microbench.py.
"""

from __future__ import annotations

import contextlib
import time

import jax


def time_op(fn, *args, warmup: int = 1, iters: int = 5):
    """Best-of-iters wall time of fn(*args) with block_until_ready.

    Returns (best_seconds, result_of_last_call).
    """
    out = None
    for _ in range(max(warmup, 0)):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
