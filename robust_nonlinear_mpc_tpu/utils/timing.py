"""Profiling helpers.

The reference instruments three wall-clock spans per solve (t_jac / t_qp /
t_backward, SURVEY.md §5); the TPU-native equivalents are:

  * `SCPSLSSolver.solve_profiled` — per-stage spans with device barriers,
  * `trace` — a context manager around `jax.profiler` for full XLA traces
    (op-level timings, HBM traffic) viewable in TensorBoard/Perfetto,
  * `timed` — a barrier-accurate wall-clock helper for benchmarks.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rnm_trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 10, warmup: int = 1):
    """Median wall-clock of fn(*args) with block_until_ready barriers.

    Returns (result, seconds_per_call).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return out, times[len(times) // 2]
