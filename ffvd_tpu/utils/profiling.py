"""Profiling / tracing helpers (SURVEY.md §5 tracing row).

The reference's only tracing is commented-out ``time.time()`` probes
(models.py:141-197) feeding a ``running_time_seq`` saved into the results npz
(base_model.py:516).  Here: a real ``jax.profiler`` trace context, a simple
section timer that fills a ``running_time_seq``-compatible list, and a
throughput meter.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import List

import jax

from ffvd_tpu.utils.timing import hard_sync


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ffvd_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulates wall-clock per named section; ``running_time_seq`` mirrors
    the reference's results-npz field."""

    def __init__(self):
        self.sections = {}
        self.running_time_seq: List[float] = []

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.time()
        yield
        if block_on is not None:
            # hard_sync, not block_until_ready — the latter is a no-op on
            # the axon backend (ffvd_tpu/utils/timing.py).
            hard_sync(block_on)
        dt = time.time() - t0
        self.sections[name] = self.sections.get(name, 0.0) + dt
        self.running_time_seq.append(dt)


def throughput(fn, *args, iters_per_call: int = 1, warmup: int = 1,
               repeats: int = 3):
    """(iters/sec, sec/call) of a blocking-sampled jitted callable."""
    for _ in range(warmup):
        hard_sync(fn(*args))
    t0 = time.time()
    for _ in range(repeats):
        out = fn(*args)
    hard_sync(out)
    per_call = (time.time() - t0) / repeats
    return iters_per_call / per_call, per_call
