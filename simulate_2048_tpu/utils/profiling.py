"""Profiling harnesses: jax.profiler traces + wall-clock timing.

TPU-native replacement for the reference's cProfile harness
(``scripts/profile_mcts.py:37-43`` — which is also broken, calling a removed
signature): ``trace`` captures an xplane/perfetto trace viewable in
TensorBoard or ui.perfetto.dev; ``time_fn`` separates compile from steady
state like ``scripts/benchmark_training.py:171-189``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a device trace: ``with trace('profiles'): run_workload()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out: Any) -> None:
    """Force a device→host round-trip.

    ``block_until_ready`` alone is not a reliable fence on remote-attached
    TPU backends (the first call can return before work drains); fetching one
    scalar-sized slice of a result is.
    """
    leaves = jax.tree.leaves(out)
    if leaves:
        jax.device_get(jax.tree.map(lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, leaves[0]))


def time_fn(fn: Callable[[], Any], warmup: int = 1, reps: int = 5) -> dict[str, float]:
    """Time a nullary device function; returns compile/steady stats in ms."""
    t0 = time.perf_counter()
    for _ in range(max(warmup, 1)):
        out = fn()
    _sync(out)
    compile_ms = (time.perf_counter() - t0) * 1e3

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "compile_plus_first_ms": compile_ms,
        "best_ms": times[0],
        "median_ms": times[len(times) // 2],
        "mean_ms": sum(times) / len(times),
    }
