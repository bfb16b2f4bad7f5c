"""Profiling utilities: XLA trace capture + per-step wall timers.

The TPU-side replacement for the reference's absent Python profiler story
(SURVEY.md §5: it only had thop FLOPs and the iOS FPS harness): a context
manager around ``jax.profiler`` trace capture (view in TensorBoard/Perfetto)
and a lightweight step timer for train/serve loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for everything inside the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-time stats for a repeated step (host-side)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.time() - self._t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        d = np.asarray(self.samples)
        return {
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p99_ms": float(np.percentile(d, 99) * 1e3),
            "steps_per_sec": float(1.0 / d.mean()),
        }
