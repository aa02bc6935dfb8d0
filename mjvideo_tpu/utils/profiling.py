"""Tracing / profiling / throughput observability.

The reference has no structured tracing — only ad-hoc wall-clock timing in
eval scripts (``eval_overall_internvl2_2b.py:31-38``) and HF Trainer
tensorboard scalars (SURVEY.md §5).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  perfetto/tensorboard traces of device execution.
* ``annotate(name)`` — host-side named region visible in the trace.
* ``Throughput`` — the north-star clips/sec counter with EMA smoothing.
* ``StepTimer`` — per-step wall/device timing that writes JSONL.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace (open in tensorboard or perfetto)."""
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('decode'): ...``."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """clips/sec (or any unit/sec) counter with exponential smoothing."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate: Optional[float] = None
        self.total = 0
        self._t0 = time.perf_counter()
        self._last = self._t0

    def update(self, n: int) -> float:
        now = time.perf_counter()
        dt = max(now - self._last, 1e-9)
        inst = n / dt
        self.rate = inst if self.rate is None else (
            self.ema * self.rate + (1 - self.ema) * inst
        )
        self.total += n
        self._last = now
        return self.rate

    def average(self) -> float:
        return self.total / max(time.perf_counter() - self._t0, 1e-9)


class StepTimer:
    """Per-step timing + metrics that appends JSONL records."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._t = time.perf_counter()

    def step(self, **metrics) -> dict:
        now = time.perf_counter()
        rec = {"step_time_s": round(now - self._t, 5), **metrics}
        self._t = now
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")
        return rec


def enable_compilation_cache(cache_dir: str = "/tmp/jax_cache",
                             min_compile_secs: float = 1.0) -> bool:
    """Turn on JAX's persistent compilation cache (idempotent).

    On the axon-tunneled TPU a fresh jit of the 2B model costs ~5 minutes of
    remote compilation; the cache makes repeated runs (benchmarks, evals,
    resumed trainings) start in seconds.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return True
    except Exception:
        return False
