"""Profiling/tracing harness.

The reference's observability is criterion microbenches + CLI wall-clock
timing (SURVEY §5). The TPU equivalent: ``jax.profiler`` traces for the
device pipeline plus stage timers reporting MP/s per config.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/pixo_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around the enclosed block.

    View with TensorBoard or xprof: the device pipeline's fusion layout,
    HBM traffic, and per-kernel times show up per dispatch.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"jax profiler trace written to {log_dir}", file=sys.stderr)


class stage_timer:
    """Wall-clock stage timer reporting MP/s (CLI --verbose analog)."""

    def __init__(self, name: str, megapixels: Optional[float] = None,
                 stream=None):
        self.name = name
        self.megapixels = megapixels
        self.stream = stream  # resolved at exit so capture wrappers work
        self.elapsed = 0.0

    def __enter__(self) -> "stage_timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> bool:
        self.elapsed = time.perf_counter() - self._t0
        rate = (
            f"  ({self.megapixels / self.elapsed:.1f} MP/s)"
            if self.megapixels
            else ""
        )
        print(f"{self.name}: {self.elapsed * 1000:.2f} ms{rate}",
              file=self.stream or sys.stderr)
        return False
