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


def trace_op_breakdown(trace_dir: str, groups: Optional[dict] = None) -> dict:
    """Parse the newest ``.xplane.pb`` under ``trace_dir`` (written by
    jax.profiler.start_trace) into per-op-group device-time sums.

    groups: {group_name: (name_substring, ...)} — an event whose op name
    contains any of the substrings (case-insensitive) is accumulated into
    that group; first matching group wins.

    Returns {"plane", "total_ms", "groups": {g: ms}, "top_ops": [[name,
    ms], ...]}. Prefers a ``/device:*`` plane (the accelerator timeline —
    this is what BENCH's per-component fields are keyed on, so
    round-over-round comparisons survive chip-health drift, VERDICT r4
    next #3); on the CPU backend it falls back to the host plane, whose
    totals include Python-frame events — fine for tests, not for claims.

    Parsing needs tensorflow's bundled xplane proto; raises ImportError
    without it (bench.py treats that as "components unavailable")."""
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [p for p in space.planes
                     if p.name.startswith("/device:") and p.lines]
    planes = device_planes or [p for p in space.planes
                               if p.name.startswith("/host:") and p.lines]
    if not planes:
        raise ValueError(f"no device/host plane in {paths[-1]}")
    plane = max(planes, key=lambda p: sum(
        e.duration_ps for ln in p.lines for e in ln.events))
    # an "XLA Ops" line is the flat non-overlapping op timeline; module/step
    # lines nest the same time and would double-count
    lines = [ln for ln in plane.lines if "ops" in ln.name.lower()] \
        or list(plane.lines)

    meta = {m.id: m.name for m in plane.event_metadata.values()}
    per_op: dict = {}
    for ln in lines:
        for e in ln.events:
            name = meta.get(e.metadata_id, "?")
            per_op[name] = per_op.get(name, 0) + e.duration_ps

    out_groups = {g: 0.0 for g in (groups or {})}
    total = 0.0
    for name, ps in per_op.items():
        ms = ps / 1e9
        total += ms
        low = name.lower()
        for g, subs in (groups or {}).items():
            if any(s.lower() in low for s in subs):
                out_groups[g] += ms
                break
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:10]
    return {"plane": plane.name, "total_ms": round(total, 3),
            "groups": {g: round(v, 3) for g, v in out_groups.items()},
            "top_ops": [[n, round(ps / 1e9, 3)] for n, ps in top]}


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
