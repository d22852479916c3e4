"""Training observability: timing, device memory, formatted log tables.

The reference hand-rolls all of this with ``print`` (header
``main_train_loop.py:144-157``, epoch rows ``:179-180``, in-epoch rows
``train_one_epoch.py:124-155``, GPU memory ``training_utils.py:136-142``).
We keep the same table layout (so logs are directly comparable) and add the
TPU-correct pieces: ``block_until_ready`` timing and ``jax.profiler`` trace
capture hooks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional, Tuple

import jax

__all__ = [
    "fmt_hms",
    "rule",
    "device_mem_mb",
    "StepTimer",
    "profiler_trace",
]


def fmt_hms(sec: float) -> str:
    m, s = divmod(int(sec), 60)
    h, m = divmod(m, 60)
    return f"{h:d}:{m:02d}:{s:02d}"


def rule(w: int = 92, ch: str = "─") -> str:
    return ch * w


def device_mem_mb(device: Optional[jax.Device] = None) -> Tuple[float, float]:
    """(bytes_in_use, peak_bytes) in MB for the first local device; (0, 0)
    where the backend exposes no stats (CPU)."""
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        stats = None
    if not stats:
        return 0.0, 0.0
    MB = 1024**2
    return (
        stats.get("bytes_in_use", 0) / MB,
        stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / MB,
    )


class StepTimer:
    """Wall-clock step timer.  JAX dispatch is async — call ``mark(result)``
    with a device value to block until it is ready before reading the time
    (the reference's ``time.perf_counter`` pairs are implicitly synchronous
    because of ``.item()`` calls)."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def reset(self) -> None:
        self.t0 = time.perf_counter()

    def mark(self, result=None) -> float:
        if result is not None:
            # device_get, not block_until_ready: the latter can no-op over
            # remote/tunneled transports, silently timing only dispatch
            jax.device_get(result)
        return (time.perf_counter() - self.t0) * 1000.0  # ms


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a ``jax.profiler`` trace for the enclosed block when a logdir
    is given (the profiler integration the reference lacks, SURVEY.md §5)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
