"""Tracing / profiling / debug utilities.

The reference has no profiling at all — only tqdm postfix loss readouts
(SURVEY.md §5 tracing). Here:
  - `trace(logdir)`: jax.profiler trace context (TensorBoard/Perfetto/XPlane)
  - `timed(fn)`: wall-clock a jit'd callable with a true device sync via a
    host fetch (`block_until_ready` does not wait on the axon TPU tunnel)
  - `enable_debug_checks()`: NaN/invalid-rank guards for test/debug runs
  - `enable_compilation_cache(dir)`: persistent XLA compile cache — the big
    cold-start lever for serving/CLI restarts
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: `with trace("/tmp/tb"): step(...)` then inspect in
    TensorBoard or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """True device sync: host-fetch ONE scalar from the last leaf.
    (jax.block_until_ready returns early on the axon TPU tunnel, and
    fetching a whole array would ship it over the tunnel at ~60 MB/s —
    so index down to a scalar ON DEVICE, then fetch only that.)"""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return
    x = leaves[-1]
    if hasattr(x, "ndim") and getattr(x, "ndim", 0):
        x = x.reshape(-1)[0]  # device-side index -> 0-d array
    np.asarray(x)


def timed(fn: Callable, *args, reps: int = 10, warmup: int = 1,
          **kwargs) -> dict:
    """Time a callable with compile excluded and fetch-based sync.
    Returns {"mean_s", "per_sec"}."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return {"mean_s": dt, "per_sec": 1.0 / dt if dt else float("inf")}


def enable_debug_checks():
    """NaN checking + strict rank promotion (test/debug; slows compile)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_numpy_rank_promotion", "warn")


def enable_compilation_cache(cache_dir: Optional[str] = None):
    """Persistent compilation cache so CLI/serving restarts skip the
    20-40 s first-compile penalty."""
    cache_dir = cache_dir or "/tmp/atx_jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
