"""Observability: render statistics, structured step logs, profiling hooks.

The reference's observability is a wall-clock egui label and a thread-count
readout (src/gui.rs:325-331).  Here: rays/s accounting, per-phase timers, and
``jax.profiler`` integration (SURVEY.md section 5 tracing bullet).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import sys
import time


@dataclasses.dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    max_depth: int

    @property
    def primary_rays(self) -> int:
        return self.width * self.height * self.spp

    def mrays_per_s(self, elapsed_s: float) -> float:
        """Primary Mrays/s (the standard headline metric; bounce rays are a
        scene-dependent multiple of this)."""
        return self.primary_rays / elapsed_s / 1e6


class PhaseTimer:
    """Accumulating per-phase wall-clock timer (build/trace/shade/reduce)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (
                self.totals.get(name, 0.0) + time.perf_counter() - t0
            )

    def report(self) -> dict:
        return dict(self.totals)


def log_step(step: int, **fields) -> None:
    """One JSON line per step to stderr (loss, rays, Mrays/s, ...)."""
    print(json.dumps({"step": step, **fields}), file=sys.stderr)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
