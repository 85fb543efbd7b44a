"""BEV 2D histograms of point clouds (X2).

`point_cloud_to_histogram(160, 100, pc)` semantics
(metrics/metrics/histogram/histogram.py:4-18): 100x100 bins over
[-80, 80] m in x/y. Depth masks applied by the callers
(KITTI 3-70 m, nuScenes 2-90 m; mmd.py:39-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def point_cloud_to_histogram(pc_xy: np.ndarray, field_size: float = 160.0,
                             bins: int = 100) -> np.ndarray:
    """(N, >=2) points -> (bins, bins) histogram, numpy host path."""
    half = (bins / 2) * (field_size / bins) if bins % 2 == 0 else None
    assert half is not None, "bins must be even (reference errors otherwise)"
    h, _ = np.histogramdd(pc_xy[:, :2], bins=bins,
                          range=([-half, half], [-half, half]))
    return h


def depth_mask(pc: np.ndarray, lo: float, hi: float) -> np.ndarray:
    d = np.linalg.norm(pc[:, :3], 2, axis=1)
    return (d > lo) & (d < hi)


def kitti_histogram(pc: np.ndarray) -> np.ndarray:
    """KITTI convention: mask 3-70 m (mmd.py:39-44)."""
    return point_cloud_to_histogram(pc[depth_mask(pc, 3.0, 70.0)])


def nuscenes_histogram(pc: np.ndarray) -> np.ndarray:
    """nuScenes convention: mask 2-90 m (mmd.py:46-56)."""
    return point_cloud_to_histogram(pc[depth_mask(pc, 2.0, 90.0)])


def histogram_batch_jax(pc: jnp.ndarray, mask: jnp.ndarray,
                        field_size: float = 160.0,
                        bins: int = 100) -> jnp.ndarray:
    """On-device batched histogram: (B, N, >=2) + (B, N) mask ->
    (B, bins, bins). Matches np.histogramdd edge conventions: values on the
    upper edge fall into the last bin; out-of-range dropped."""
    half = field_size / 2.0
    width = field_size / bins

    def one(p, m):
        x, y = p[:, 0], p[:, 1]
        inside = m & (x >= -half) & (x <= half) & (y >= -half) & (y <= half)
        ix = jnp.clip(jnp.floor((x + half) / width).astype(jnp.int32), 0, bins - 1)
        iy = jnp.clip(jnp.floor((y + half) / width).astype(jnp.int32), 0, bins - 1)
        lin = jnp.where(inside, ix * bins + iy, 0)
        w = inside.astype(jnp.float32)
        return jnp.zeros((bins * bins,), jnp.float32).at[lin].add(w).reshape(
            bins, bins)

    return jax.vmap(one)(pc, mask)
