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


def parse_trace_utilization(log_dir: str) -> Optional[Dict[str, Any]]:
    """Parse the newest perfetto trace under log_dir and measure the TPU
    device's op occupancy: for every XLA op event on the device 'XLA Ops'
    track, take the profiler's device_duration; report the top-level
    (non-nested) busy time and its breakdown by op class. This is a
    MEASURED duty cycle from the trace, not a FLOP back-computation —
    the kernel-resident fraction of wall time (the quantity a roofline
    starts from)."""
    import glob
    import gzip
    import os
    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime)
    if os.path.isfile(log_dir) and log_dir.endswith(".json.gz"):
        paths = [log_dir]
    if not paths:
        return None
    d = json.load(gzip.open(paths[-1]))
    evs = d.get("traceEvents", [])
    # find the device pid and its 'XLA Ops' tid
    dev_pid = ops_tid = None
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name" and \
                "TPU" in str((e.get("args") or {}).get("name", "")):
            dev_pid = e["pid"]
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and \
                e.get("pid") == dev_pid and \
                (e.get("args") or {}).get("name") == "XLA Ops":
            ops_tid = e["tid"]
    if dev_pid is None or ops_tid is None:
        return None
    ops = [e for e in evs if e.get("pid") == dev_pid
           and e.get("tid") == ops_tid and e.get("ph") == "X"]
    if not ops:
        return None
    # top-level events only: drop events fully contained in another
    # (XLA Ops is hierarchical: while > closed_call > fusion ...)
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    top: List[Dict[str, Any]] = []
    cur_end = -1.0
    for e in ops:
        if e["ts"] >= cur_end:
            top.append(e)
            cur_end = e["ts"] + e["dur"]
    span = max(e["ts"] + e["dur"] for e in ops) - min(e["ts"] for e in ops)
    busy = sum(e["dur"] for e in top)
    by_class: Dict[str, float] = {}
    for e in top:
        cls = e["name"].split(".")[0]
        by_class[cls] = by_class.get(cls, 0.0) + e["dur"]
    top_classes = dict(sorted(by_class.items(), key=lambda kv: -kv[1])[:6])
    # the Mosaic sample-kernel launches appear as closed_call/custom-call
    # events (nested inside the frame-scan `while`): their summed device
    # duration over the span is the KERNEL-resident fraction
    kern = sum(e["dur"] for e in ops
               if e["name"].split(".")[0] in ("closed_call", "custom-call"))
    return {"trace": os.path.basename(paths[-1]),
            "span_us": round(span, 1), "busy_us": round(busy, 1),
            "duty_cycle": round(min(kern / span, 1.0), 4),
            "device_occupancy": round(min(busy / span, 1.0), 4),
            "busy_us_by_class": {k: round(v, 1)
                                 for k, v in top_classes.items()}}


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
