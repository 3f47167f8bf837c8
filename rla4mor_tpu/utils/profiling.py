"""Profiling / timing utilities.

The reference has no tracing or profiling at all (SURVEY §5: only a stray
unused ``perf_counter`` import, reference inverse_problems/
recovery_map.py:12). Here: a wall-clock timer registry for offline phases
and a ``jax.profiler`` trace context for device work (view with
TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp


def device_fence() -> None:
    """Block the host until all previously-enqueued device work finishes.

    A tiny program is enqueued AFTER the pending work and its result is
    transferred to the host: device streams execute in enqueue order, so
    the transfer cannot complete early. This is the only sync that is
    honest on the axon platform, where ``jax.block_until_ready`` returns
    before the device is done and ``jax.effects_barrier`` only waits for
    effectful computations (see bench.py's measurement methodology).
    """
    import numpy as np

    np.asarray(jnp.zeros(()) + 0.0)


class Timers:
    """Named wall-clock timer accumulation (host-side phases)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync: bool = False) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                device_fence()  # flush device work: honest timing
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:40s} {t:9.3f}s  ({c} calls, {t / c:.4f}s avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/rla4mor_trace") -> Iterator[None]:
    """jax.profiler trace context: captures XLA/TPU timelines for xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_block_until_ready(fn, *args, iters: int = 5, warmup: int = 1):
    """Median wall time of ``fn(*args)`` with device sync (a host fence,
    because block_until_ready does not synchronize on the axon platform)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
        device_fence()
    times: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        device_fence()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
