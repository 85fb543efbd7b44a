"""Tracing / profiling hooks (SURVEY.md section 5: the reference has none;
jax.profiler traces are nearly free to add).

Usage:
    with maybe_trace("runs/x/trace", enabled=cfg.get("profile")):
        state, metrics = train_step(...)

or annotate phases:
    with step_annotation("vae_encode"): ...
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str], enabled: bool = False):
    """Capture an XLA/TensorBoard profiler trace around the block."""
    if not enabled or not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes in use / limit) where the backend
    reports it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out
