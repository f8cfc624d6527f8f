"""Tracing / profiling helpers.

The reference's tracing is Vulkan debug-utils labels + object naming
surfacing in RenderDoc (SURVEY §5), plus a live FPS panel.  The TPU
equivalents:

- named trace scopes per pipeline stage (raygen/traverse/shade) that show
  up in XLA/Perfetto traces (jax.profiler.TraceAnnotation) and in HLO
  metadata (jax.named_scope)
- a lightweight step timer producing Mrays/s records for utils.metrics

Note: on remote-tunneled TPU backends, jax.profiler.trace may not be able
to pull device traces; named scopes still annotate compiled HLO, and the
step timer works everywhere.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def stage(name: str):
    """Named scope for a pipeline stage: annotates HLO + host trace.

    Usage:
        with profiling.stage("traverse"):
            rec = intersect_scene(...)
    """
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


class StepTimer:
    """Rolling frame-time stats — the headless analog of the reference's FPS
    min/max/avg panel (src/editor.jai:322-353)."""

    def __init__(self, window: int = 64):
        self.window = window
        self.times: list = []

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def stats(self) -> dict:
        if not self.times:
            return dict(frames=0)
        return dict(
            frames=len(self.times),
            last_ms=self.times[-1] * 1e3,
            avg_ms=sum(self.times) / len(self.times) * 1e3,
            min_ms=min(self.times) * 1e3,
            max_ms=max(self.times) * 1e3,
        )


def profile_trace(path: str):
    """Context manager wrapping jax.profiler.trace (Perfetto dump dir)."""
    return jax.profiler.trace(path)
