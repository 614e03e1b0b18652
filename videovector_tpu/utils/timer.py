"""Timing / profiling utilities.

ref:include/caffe/util/benchmark.hpp:10-36 (Timer over boost ptime +
cudaEvent pairs) and the `caffe time` per-layer loops (tools/caffe.cpp:194-266,
reimplemented in tools/cli.py). On TPU the async dispatch model means device
work must be fenced before reading the clock — `device_fence` fetches a
scalar, which is reliable even on the experimental axon platform where
block_until_ready is not.

`trace` wraps jax.profiler for deep traces (xplane output for xprof/
tensorboard), the analogue the reference never had.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


def device_fence(x) -> None:
    """Force completion of everything `x` depends on — any pytree of
    arrays (block_until_ready is unreliable on the axon platform, so a
    small D2H fetch per array leaf is the fence; a silent no-op for
    tuple/dict inputs would record dispatch time as the measurement)."""
    import jax
    import numpy as np
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "dtype"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim
                                      else leaf))


@dataclass
class Timer:
    """start/stop accumulator in milliseconds (ref Timer API)."""
    total_ms: float = 0.0
    calls: int = 0
    _t0: float = field(default=0.0, repr=False)
    _running: bool = field(default=False, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._running = True

    def stop(self, fence=None) -> float:
        if fence is not None:
            device_fence(fence)
        if not self._running:
            return 0.0  # stop without start: no garbage epoch delta
        dt = (time.perf_counter() - self._t0) * 1e3
        self.total_ms += dt
        self.calls += 1
        self._running = False
        return dt

    @property
    def average_ms(self) -> float:
        return self.total_ms / max(self.calls, 1)


class StepTimer:
    """Rolling steps/sec meter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
