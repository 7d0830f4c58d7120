"""Tracing & per-stage timing (the observability layer the reference lacks;
SURVEY.md section 5 requires it to substantiate RT-factor / scaling claims).

Two tools:
  * trace(dir): context manager around jax.profiler.trace — produces a
    TensorBoard/XProf trace of everything inside (compilations, HLO ops,
    host<->device transfers).
  * StageTimer: named wall-clock stages with block_until_ready fencing, so
    timings measure device work rather than dispatch. Prints/returns a
    summary dict. Used by bench.py (LPCNET_PROFILE_DIR env enables traces).
"""
import contextlib
import json
import time
from typing import Any, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if log_dir is set, no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates wall-clock per named stage; fences device work."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def add(self, name: str, seconds: float, n: int = 1) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + n

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 6),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * v / max(1, self.counts[k]), 4)}
                for k, v in self.totals.items()}

    def report(self) -> str:
        return json.dumps(self.summary())
