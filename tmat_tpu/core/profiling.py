"""Per-stage timing and device profiling.

The reference has no tracing/profiling affordances beyond tqdm progress
bars (SURVEY §5); this is the TPU-native equivalent: a lightweight stage
timer printed per pipeline run, plus an opt-in jax.profiler trace gated by
the TMAT_TPU_PROFILE_DIR environment variable.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named pipeline stage.

    Thread-safe: pipeline stages may run concurrently from worker threads
    (the plate pipeline streams per-chunk host postprocess under the
    device queue), so stage totals of overlapping stages can exceed the
    pipeline wall-clock — they are per-stage work accounting, not a
    partition of elapsed time.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._lock = threading.Lock()

    @contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with self._lock:
                self.totals[name] = self.totals.get(name, 0.0) + elapsed
                self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"  {name}: {total:.3f}s total / {n} calls "
                         f"({total / n * 1000:.1f} ms avg)")
        return "\n".join(lines)


@contextmanager
def maybe_profile(label: str = "tmat_tpu"):
    """jax.profiler trace when TMAT_TPU_PROFILE_DIR is set; no-op otherwise."""
    profile_dir = os.environ.get("TMAT_TPU_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(profile_dir, label)):
        yield
