"""MMD between histogram sets (X3) — one matmul-shaped reduction on device.

Matches metrics/metrics/histogram/dist_helper.py:84-103 (Gaussian kernel
sigma=0.5 on pmf-normalized histograms) and :131-172 (discrepancy means
include the diagonal). The reference thread-pools an O(N^2) Python loop;
here the full kernel matrix is three pairwise-distance matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(h: jnp.ndarray) -> jnp.ndarray:
    flat = h.reshape(h.shape[0], -1)
    return flat / jnp.sum(flat, axis=1, keepdims=True)


def _mean_kernel(a: jnp.ndarray, b: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """mean over all pairs of exp(-||a_i - b_j||^2 / (2 sigma^2)); f64 on
    host path matches the reference's numpy accumulation."""
    sq_a = jnp.sum(a * a, axis=1)
    sq_b = jnp.sum(b * b, axis=1)
    d2 = sq_a[:, None] + sq_b[None, :] - 2.0 * (a @ b.T)
    d2 = jnp.maximum(d2, 0.0)
    return jnp.mean(jnp.exp(-d2 / (2.0 * sigma * sigma)))


@jax.jit
def _mmd_jit(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    sigma = 0.5
    x = _normalize(x)
    y = _normalize(y)
    return (_mean_kernel(x, x, sigma) + _mean_kernel(y, y, sigma)
            - 2.0 * _mean_kernel(x, y, sigma))


def compute_mmd(hists_a, hists_b) -> float:
    """MMD^2 between two sets of (bins, bins) histograms
    (reference set first, per mmd.py:123)."""
    a = jnp.asarray(np.stack([np.asarray(h, np.float64) for h in hists_a])
                    .reshape(len(hists_a), -1).astype(np.float32))
    b = jnp.asarray(np.stack([np.asarray(h, np.float64) for h in hists_b])
                    .reshape(len(hists_b), -1).astype(np.float32))
    return float(_mmd_jit(a, b))
