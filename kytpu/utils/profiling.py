"""Observability: wall-clock phase timing, rays/s counters, device traces.

Systematizes the reference's `timing_seconds` + per-row progress printf
(ky.cpp:156-163, 3703) and fills its empty `profiler_t` stub
(ky.cpp:4659-4662): a RenderTimer accumulates per-phase wall time and ray
counts; `trace_to` wraps a block in a JAX profiler trace for op-level
on-device analysis (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class RenderTimer:
    phases: dict = field(default_factory=dict)   # name -> seconds
    rays: int = 0

    @contextlib.contextmanager
    def phase(self, name: str, rays: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.rays += rays

    @property
    def total(self) -> float:
        return sum(self.phases.values())

    def rays_per_second(self) -> float:
        t = self.total
        return self.rays / t if t > 0 else 0.0

    def report(self) -> str:
        lines = [f"{k:>16s}: {v:8.3f} s" for k, v in self.phases.items()]
        lines.append(f"{'total':>16s}: {self.total:8.3f} s"
                     f"  ({self.rays_per_second()/1e6:.2f} Mrays/s)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a JAX profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
