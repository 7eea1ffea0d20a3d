"""Profiling/tracing hooks.

The reference only has wall-clock timers (reference feature_extraction.py:
275-300, semi_supervised.py:124-137). Here: the same imgs/sec counters plus
real ``jax.profiler`` trace capture — set ``SSIP_PROFILE_DIR`` (or pass
``profile_dir``) and every wrapped section emits a TensorBoard-loadable
trace of host + device activity.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)

ENV_PROFILE_DIR = "SSIP_PROFILE_DIR"


@contextmanager
def trace(name: str, profile_dir: Optional[Path] = None) -> Iterator[None]:
    """jax.profiler trace around a section when profiling is enabled."""
    directory = profile_dir or os.environ.get(ENV_PROFILE_DIR)
    if not directory:
        yield
        return
    target = Path(directory) / name
    target.mkdir(parents=True, exist_ok=True)
    LOGGER.info("Capturing profiler trace for '%s' under %s", name, target)
    with jax.profiler.trace(str(target)):
        yield


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (shows up on the host timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class PhaseTimer:
    """Accumulates named phase durations + item counts → rates."""

    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str, items: int = 0) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.phases[name] = self.phases.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + items

    def rate(self, name: str) -> float:
        seconds = self.phases.get(name, 0.0)
        return self.counts.get(name, 0) / seconds if seconds > 0 else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "seconds": round(self.phases[name], 4),
                "items": self.counts.get(name, 0),
                "items_per_sec": round(self.rate(name), 2),
            }
            for name in self.phases
        }
