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


def data_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding for an activation of rank `ndim`."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the leading axis sharded on 'data'."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
