"""Observability: throughput counters, profiler traces, NaN-check mode.

The reference's only instrumentation is wall-clock epoch timing printed to
stdout (SURVEY.md §5). Here:

- :class:`StepMeter` accumulates steps/edges/subgraphs per second — the
  BASELINE.md north-star counters — with negligible overhead (host-side
  timestamps around already-blocking device calls);
- :func:`trace` wraps a block in a ``jax.profiler`` trace for xprof/tensorboard;
- :func:`nan_check_mode` enables jax_debug_nans, the functional-world
  replacement for cuDNN-determinism-style debugging switches.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator, Optional


@dataclasses.dataclass
class StepMeter:
    """Accumulates training throughput. Call ``tick`` after each (blocking)
    step with the work it performed."""

    edges_per_step: int = 0
    subgraphs_per_step: int = 0
    steps: int = 0
    _t0: Optional[float] = None
    _elapsed: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def tick(self, steps: int = 1) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self._elapsed += now - self._t0
        self._t0 = now
        self.steps += steps

    @property
    def seconds(self) -> float:
        return self._elapsed

    @property
    def steps_per_s(self) -> float:
        return self.steps / self._elapsed if self._elapsed else 0.0

    @property
    def edges_per_s(self) -> float:
        return self.steps_per_s * self.edges_per_step

    @property
    def subgraphs_per_s(self) -> float:
        return self.steps_per_s * self.subgraphs_per_step

    def summary(self) -> str:
        return (
            f"{self.steps} steps in {self._elapsed:.2f}s: "
            f"{self.steps_per_s:.1f} steps/s, "
            f"{self.edges_per_s / 1e6:.1f}M edges/s, "
            f"{self.subgraphs_per_s:.1f} subgraphs/s"
        )


@contextlib.contextmanager
def trace(name: str, log_dir: str = "/tmp/glass_tpu_trace") -> Iterator[None]:
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    import jax

    with jax.profiler.trace(log_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def nan_check_mode() -> Iterator[None]:
    """Enables jax_debug_nans within the block: any NaN produced by a jitted
    computation raises immediately with the offending primitive."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
