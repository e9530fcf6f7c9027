"""Profiling harness (SURVEY §5.1: the reference has only a wall-clock
dt; the build promises jax.profiler traces + block_until_ready timing).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/raypt_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, reps: int = 3, warmup: int = 1,
            **kwargs) -> dict:
    """Compile + time a jax function with block_until_ready; returns
    {compile_s, best_s, mean_s}."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {"compile_s": compile_s, "best_s": min(times),
            "mean_s": sum(times) / len(times)}


def rays_per_sec(cfg, seconds: float, frames: int = 1) -> float:
    """Upper-bound path-segment throughput for a RenderConfig
    (SURVEY §6 accounting)."""
    segs = cfg.width * cfg.height * cfg.samples_per_pixel * \
        cfg.num_bounces * frames
    return segs / seconds
