"""Tracing / profiling utilities.

The reference's only observability was hand-rolled wall-clock timing
persisted to ``embedding_summary.json``
(``extract_rg_embeddings.py:328-336,402-413,437-448``).  Here the same
summary-JSON artifact format is kept (:class:`StageTimer`) and augmented
with real device profiling through ``jax.profiler`` traces viewable in
XProf/TensorBoard (:func:`trace`).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; JSON-serializable summary."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_seconds": self.totals[name],
                "count": self.counts[name],
                "avg_seconds": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device profile (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
