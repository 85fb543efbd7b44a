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


def _mean_kernel_np(a: np.ndarray, b: np.ndarray, sigma: float) -> float:
    d2 = (np.sum(a * a, axis=1)[:, None] + np.sum(b * b, axis=1)[None, :]
          - 2.0 * (a @ b.T))
    np.maximum(d2, 0.0, out=d2)
    return float(np.mean(np.exp(-d2 / (2.0 * sigma * sigma))))


def compute_mmd(hists_a, hists_b, device: bool = False) -> float:
    """MMD^2 between two sets of (bins, bins) histograms
    (reference set first, per mmd.py:123).

    Default is the host float64 path — benchmark MMD^2 values are O(1e-4)
    while each mean-kernel term is O(1), so the k_xx + k_yy - 2 k_xy
    cancellation loses ~0.1-1% in float32; the reference accumulates in
    numpy float64. device=True uses the f32 TPU matmul path (fast, for
    in-training monitoring)."""
    if device:
        a = jnp.asarray(np.stack([np.asarray(h, np.float64) for h in hists_a])
                        .reshape(len(hists_a), -1).astype(np.float32))
        b = jnp.asarray(np.stack([np.asarray(h, np.float64) for h in hists_b])
                        .reshape(len(hists_b), -1).astype(np.float32))
        return float(_mmd_jit(a, b))
    a = np.stack([np.asarray(h, np.float64) for h in hists_a]).reshape(
        len(hists_a), -1)
    b = np.stack([np.asarray(h, np.float64) for h in hists_b]).reshape(
        len(hists_b), -1)
    a = a / np.sum(a, axis=1, keepdims=True)
    b = b / np.sum(b, axis=1, keepdims=True)
    sigma = 0.5
    return (_mean_kernel_np(a, a, sigma) + _mean_kernel_np(b, b, sigma)
            - 2.0 * _mean_kernel_np(a, b, sigma))
