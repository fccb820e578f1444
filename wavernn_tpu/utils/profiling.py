"""Profiling hooks (SURVEY.md §5: replaces the reference's wall-clock-only
tracing with jax.profiler traces, keeping the human-readable rate lines)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace to ``logdir`` (viewable in
    TensorBoard / xprof).  No-op when logdir is None."""
    if logdir is None:
        yield
        return
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Steps/sec + kHz meter matching the reference's live display
    (ref: train_wavernn.py:136, models/fatchord_version.py:267-271)."""

    def __init__(self) -> None:
        self.start = time.time()
        self.items = 0

    def update(self, n: int = 1) -> None:
        self.items += n

    @property
    def rate(self) -> float:
        elapsed = max(time.time() - self.start, 1e-9)
        return self.items / elapsed

    def khz(self, samples: int) -> float:
        elapsed = max(time.time() - self.start, 1e-9)
        return samples / elapsed / 1000.0
