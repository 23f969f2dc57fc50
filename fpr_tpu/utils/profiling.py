"""Profiling / tracing helpers.

The reference has no tracer (SURVEY.md §5.1), only hand-rolled wall-clock
timing with warmup exclusion and the counted-operation model
(fpr_tpu.utils.timing).  On TPU we additionally expose jax.profiler traces
for perfetto/tensorboard inspection.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(dir: str = "/tmp/fpr_tpu_trace"):
    """Capture a jax.profiler trace around a block.

    View with: tensorboard --logdir <dir>  (or upload to ui.perfetto.dev).
    """
    import jax

    jax.profiler.start_trace(dir)
    try:
        yield dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class WallClock:
    """Warmup-excluding wall clock (part1_kernel_programming.jl:170-176)."""

    def __init__(self, warmup_steps: int = 3):
        self.warmup_steps = warmup_steps
        self._tic = time.time()
        self._step = 0

    def step(self):
        self._step += 1
        if self._step == self.warmup_steps:
            self._tic = time.time()

    @property
    def elapsed(self) -> float:
        return time.time() - self._tic
