"""Tracing / profiling utilities.

The reference has no profiling beyond tqdm rates and a wall-clock total
(SURVEY.md §5).  Here:

  * ``StepTimer`` — lightweight rolling step/throughput telemetry that
    the Trainer logs per epoch (images/sec, ms/step).
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory when supported by the backend
    (silently degrades to a no-op where the profiler is unavailable,
    e.g. some tunneled TPU runtimes).
"""

import contextlib
import time
from typing import Optional


class StepTimer:
    """Rolling mean of step durations with derived throughput."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t_last: Optional[float] = None
        self.total_s = 0.0
        self.steps = 0
        self.items = 0

    def tick(self, items: int = 0):
        now = time.perf_counter()
        if self._t_last is not None:
            self.total_s += now - self._t_last
            self.steps += 1
            self.items += items
        self._t_last = now

    @property
    def ms_per_step(self) -> float:
        return 1e3 * self.total_s / self.steps if self.steps else float("nan")

    @property
    def items_per_sec(self) -> float:
        return self.items / self.total_s if self.total_s > 0 else float("nan")

    def summary(self, label: str = "steps") -> str:
        return f"{self.ms_per_step:.1f} ms/{label[:-1]}, {self.items_per_sec:.1f} img/s"


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``with trace('/tmp/tb'):`` — profile the enclosed block if possible."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # unsupported backend
        print(f"(profiler unavailable: {e})")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {log_dir}")
            except Exception as e:
                print(f"(profiler stop failed: {e})")
