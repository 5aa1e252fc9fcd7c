"""Profiling and tracing hooks.

The reference's only instrumentation is a per-iteration ``time.time()``
logged as ``train_time`` (``run_composite.py:231,336``). Here:

  - ``StepTimer``: per-chunk wall-clock with steps/sec and rays/sec;
  - ``trace()``: a ``jax.profiler`` trace context writing a TensorBoard-
    compatible profile (the driver flag ``--profile_steps`` uses it);
  - ``device_memory_stats()``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


class StepTimer:
    """Accumulates wall-clock per train chunk; reports derived rates."""

    def __init__(self, rays_per_step: int = 0):
        self.rays_per_step = rays_per_step
        self.reset()

    def reset(self) -> None:
        self.total_steps = 0
        self.total_time = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int) -> dict:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.total_steps += n_steps
        self.total_time += dt
        out = {
            "chunk_time_s": dt,
            "steps_per_sec": n_steps / dt if dt > 0 else 0.0,
        }
        if self.rays_per_step:
            out["rays_per_sec"] = out["steps_per_sec"] * self.rays_per_step
        return out

    def summary(self) -> dict:
        sps = self.total_steps / self.total_time if self.total_time else 0.0
        return {
            "total_steps": self.total_steps,
            "total_time_s": self.total_time,
            "steps_per_sec": sps,
            "rays_per_sec": sps * self.rays_per_step,
        }


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Opt-in persistent compilation cache (pass an explicit directory).

    Disabled by default: the axon remote-compile path is not captured by
    the client-side cache (so it saves nothing on this TPU setup), and a
    cache shared across heterogeneous CPU hosts can load AOT code compiled
    for different machine features.
    """
    if cache_dir is None:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('dir'): ...`` captures a jax.profiler device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device live memory statistics (empty where unsupported)."""
    stats = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats.append(
            {
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        )
    return stats
