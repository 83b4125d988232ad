"""Observability: structured per-stage stats, timers, and profiler hooks.

The reference's observability surface is unstructured stderr prints + tqdm
(SURVEY.md §5). Here every stage additionally records structured counters and
wall times, dumped as one JSON line to stderr (SCTAG_STATS=1) or to a file
(SCTAG_STATS=/path). Device tracing: set SCTAG_PROFILE=/tmp/trace to wrap
stage bodies in a jax.profiler trace (viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from collections import defaultdict


class StageStats:
    """Accumulates counters/timings for one stage run."""

    def __init__(self, stage: str):
        self.stage = stage
        self.counters: dict[str, float] = defaultdict(float)
        self.timers: dict[str, float] = defaultdict(float)
        self._t0 = time.perf_counter()

    def count(self, key: str, n: float = 1) -> None:
        self.counters[key] += n

    @contextlib.contextmanager
    def timer(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[key] += time.perf_counter() - t0

    def emit(self) -> None:
        record = {
            "stage": self.stage,
            "wall_s": round(time.perf_counter() - self._t0, 3),
            "counters": {k: v for k, v in sorted(self.counters.items())},
            "timers_s": {
                k: round(v, 3) for k, v in sorted(self.timers.items())
            },
        }
        dest = os.environ.get("SCTAG_STATS")
        if not dest:
            return
        line = json.dumps(record)
        if dest == "1":
            print(line, file=sys.stderr)
        else:
            with open(dest, "a") as f:
                f.write(line + "\n")


@contextlib.contextmanager
def stage_scope(stage: str):
    """Stats + optional jax.profiler trace around a stage body."""
    stats = StageStats(stage)
    profile_dir = os.environ.get("SCTAG_PROFILE")
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            yield stats
    else:
        yield stats
    stats.emit()
