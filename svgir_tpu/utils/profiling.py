"""Tracing / profiling utilities (aux subsystem, SURVEY.md §5).

The reference ships a cudaEvent ``Timing`` context manager
(utils/system_utils.py:76-87); here the equivalents are built on
``block_until_ready`` walls and ``jax.profiler``, plus the pixels/s
throughput counters that are a new requirement for the TPU build.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class Timing:
    """Context manager: blocks on ``result`` (if set) and records wall ms.

    with Timing("raster") as t:
        out = render(...)
        t.result = out
    print(t.ms)
    """

    def __init__(self, name: str = "", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.result = None
        self.ms = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.result is not None:
            jax.block_until_ready(self.result)
        self.ms = (time.perf_counter() - self.t0) * 1e3
        if self.verbose:
            print(f"[timing] {self.name}: {self.ms:.2f} ms", flush=True)
        return False


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace region (viewable in XProf/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """EMA pixels/s + iterations/s counter for training loops."""

    def __init__(self, pixels_per_step: int, alpha: float = 0.1):
        self.pixels = pixels_per_step
        self.alpha = alpha
        self.ema_dt = None
        self.last = None

    def tick(self) -> Optional[Dict[str, float]]:
        now = time.perf_counter()
        if self.last is not None:
            dt = now - self.last
            self.ema_dt = dt if self.ema_dt is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema_dt)
        self.last = now
        if self.ema_dt is None:
            return None
        return {"iters_per_s": 1.0 / self.ema_dt,
                "pixels_per_s": self.pixels / self.ema_dt}


def device_memory_stats() -> Dict[str, int]:
    """Live/peak HBM bytes for device 0 (observability hook)."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: int(v) for k, v in stats.items()
                if "bytes" in k}
    except Exception:
        return {}
