"""Profiling / timing utilities.

The reference's observability was wall-clock timestamps around training and
evaluation (SURVEY.md §5). Here: steps/s measurement with compile/exec split,
and jax.profiler trace capture for XLA-level analysis (view in Perfetto /
TensorBoard).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def measure_steps_per_second(fn: Callable, *args, steps_per_call: int,
                             warmup: int = 1, iters: int = 5) -> Dict:
    """Time a jitted program; returns compile time, best/mean exec time, and
    steps/s. Results are fetched to host (device_get) each iteration —
    block_until_ready alone was observed not to synchronize on the
    axon-relayed TPU backend, silently measuring dispatch time."""
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    compile_and_first = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        jax.device_get(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "compile_plus_first_s": compile_and_first,
        "best_exec_s": best,
        "mean_exec_s": sum(times) / len(times),
        "steps_per_s": steps_per_call / best,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
