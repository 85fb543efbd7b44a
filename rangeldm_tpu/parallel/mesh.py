"""Device mesh + sharding helpers.

The reference's distribution story is pure data parallelism over NCCL DDP
(SURVEY.md section 2.7). The TPU-native equivalent: one `jax.sharding.Mesh`
axis 'data' over all chips; batches shard on it, parameters replicate, and
the gradient all-reduce becomes an XLA psum over ICI inserted by the
compiler. Multi-host inference sharding (accelerate PartialState,
ldm/inference.py:56) maps to `jax.process_index()` batch offsets.

All helpers take an explicit mesh so tests can pass an 8-device virtual CPU
mesh while production uses the full TPU slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def largest_divisible_prefix(n: int, batch_size: int) -> int:
    """Largest k <= n with batch_size % k == 0 — THE 'auto' inference-mesh
    policy, shared by the sampling CLI (resolve_sampling_mesh) and
    RangePipeline._mesh_for_batch so they cannot silently diverge."""
    if batch_size <= 0:
        # 0 % k == 0 for every k, so a degenerate batch would silently
        # select the FULL mesh; fail at the policy layer instead (ADVICE r4)
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    n = int(n)
    while n > 1 and batch_size % n:
        n -= 1
    return max(n, 1)


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding for an activation of rank `ndim`."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the leading axis sharded on 'data'.

    Single-process: a plain device_put scatter. Multi-process (multi-host
    TPU): each process holds only its per-process slice of the global batch
    (RangeLoader(shard_by_process=True) — the accelerate-DDP equivalent,
    ldm/train_unconditional.py:128-134), so the global array is assembled
    with `jax.make_array_from_process_local_data`, which places each local
    shard on the process's addressable devices and records the global shape.
    device_put would raise on non-addressable devices here.
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def to_local_np(x) -> np.ndarray:
    """Host copy of an array that may be sharded across processes: a
    multi-host global batch spans non-addressable devices (device_get
    would raise), so fall back to this process's addressable shards —
    each process sees its own slice, as the reference's per-rank dumps
    would (accelerate gather is never used for image logging)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # dedup by index: a replicated (or partially-replicated) array has
        # several addressable shards with the SAME index — concatenating
        # them all would return an n_local_devices-fold duplicated batch.
        # Key by (start, stop, step) tuples: shard.index is a tuple of
        # slice objects, and slice is only hashable on Python >= 3.12.
        shards = {tuple((sl.start, sl.stop, sl.step) for sl in s.index): s
                  for s in x.addressable_shards}
        for s in shards.values():
            # only leading-axis sharding concatenates correctly; anything
            # else (e.g. a W-sharded activation) must fail loudly, not
            # return a silently scrambled array
            for sl in s.index[1:]:
                if sl != slice(None):
                    raise ValueError(
                        "to_local_np supports batch(axis-0)-sharded or "
                        f"replicated arrays; got shard index {s.index}")
        ordered = sorted(shards.values(),
                         key=lambda s: (s.index[0].start or 0))
        return np.concatenate([np.asarray(s.data) for s in ordered])
    return np.asarray(x)
