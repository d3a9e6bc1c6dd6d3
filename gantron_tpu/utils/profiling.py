"""Profiling / tracing helpers (SURVEY §5: the reference only logs
per-step wall-clock to wandb, train.py:295-355; here we add real tracing).

``trace(dir)`` wraps ``jax.profiler`` trace capture (view in TensorBoard or
Perfetto); ``StepTimer`` reproduces the reference's
``generation_duration``/``discriminator_duration`` metrics with proper
``block_until_ready`` hygiene when ``sync=True``.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing; ``sync`` forces device completion so the
    measurement is honest (async dispatch otherwise under-reports)."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_on) -> float:
        if self.sync and sync_on:
            jax.block_until_ready(sync_on)
        return time.perf_counter() - self._t0


def benchmark(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Mean seconds per call with compile excluded and full sync."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
