"""Structured per-stage timing — the TicToc replacement (SURVEY.md §5).

The reference wraps every stage in wall-clock ms timers and warns past the
100 ms real-time budget (include/aloam_velodyne/tic_toc.h;
scanRegistration.cpp:426-427, laserOdometry.cpp:922-923).  Here the same
observability is structured: named stages, running mean/max, budget
overrun counting, one-line report.

NOTE: JAX dispatch is async — a stage timer measures host dispatch unless
the caller blocks.  `StageTimers.stage(..., block=arr)` can be given an
array to block on for true device timings; the pipeline uses dispatch
timings for flow control and bench.py blocks explicitly.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class StageStats:
    count: int = 0
    total_ms: float = 0.0
    max_ms: float = 0.0

    def add(self, ms: float) -> None:
        self.count += 1
        self.total_ms += ms
        self.max_ms = max(self.max_ms, ms)

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


@dataclass
class StageTimers:
    budget_ms: float = 100.0
    stages: Dict[str, StageStats] = field(default_factory=dict)
    frames: int = 0
    overruns: int = 0
    _frame_start: Optional[float] = None

    @contextmanager
    def stage(self, name: str, block=None):
        if self._frame_start is None:
            self._frame_start = time.perf_counter()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax

                jax.block_until_ready(block)
            self.stages.setdefault(name, StageStats()).add(
                (time.perf_counter() - t0) * 1000.0
            )

    def frame_done(self) -> None:
        if self._frame_start is not None:
            frame_ms = (time.perf_counter() - self._frame_start) * 1000.0
            self.stages.setdefault("frame", StageStats()).add(frame_ms)
            if frame_ms > self.budget_ms:
                self.overruns += 1
            self._frame_start = None
        self.frames += 1

    @contextmanager
    def profiler_trace(self, log_dir: str):
        """Capture a jax.profiler trace around a region — the deep-dive
        counterpart to the TicToc-style stage timers (viewable in
        TensorBoard / xprof)."""
        import jax

        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def report(self) -> str:
        lines = [
            f"{name}: mean {st.mean_ms:.2f} ms, max {st.max_ms:.2f} ms "
            f"({st.count}x)"
            for name, st in sorted(self.stages.items())
        ]
        lines.append(
            f"frames: {self.frames}, over {self.budget_ms:.0f} ms budget: "
            f"{self.overruns}"
        )
        return "\n".join(lines)
