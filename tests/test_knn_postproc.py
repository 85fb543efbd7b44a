"""KNN post-processing parity vs an inline torch twin of the reference
implementation (postproc/KNN.py:36-141), plus the per-point dispatch of
user.py:146-161.

The shipped darknet53-1024 config disables KNN (arch_cfg.yaml
post.KNN.use: False) and the scored dumps are the projected argmax maps
either way (user.py:184) — see metrics/knn.py docstring — but the
capability is implemented and parity-locked here.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from rangeldm_tpu.metrics.knn import (
    gaussian_kernel, knn_postprocess, per_point_labels,
)


def torch_knn(proj_range, unproj_range, proj_argmax, px, py,
              knn=5, search=5, sigma=1.0, cutoff=1.0, nclasses=20):
    """Inline twin of postproc/KNN.py forward (CPU, unbatched)."""
    proj_range = torch.from_numpy(proj_range)
    unproj_range = torch.from_numpy(unproj_range)
    proj_argmax = torch.from_numpy(proj_argmax)
    px = torch.from_numpy(px).long()
    py = torch.from_numpy(py).long()
    H, W = proj_range.shape
    P = unproj_range.shape
    pad = int((search - 1) / 2)

    proj_unfold_k_rang = F.unfold(proj_range[None, None, ...],
                                  kernel_size=(search, search),
                                  padding=(pad, pad))
    idx_list = py * W + px
    unproj_unfold_k_rang = proj_unfold_k_rang[:, :, idx_list]
    unproj_unfold_k_rang[unproj_unfold_k_rang < 0] = float("inf")
    center = int(((search * search) - 1) / 2)
    unproj_unfold_k_rang[:, center, :] = unproj_range
    k2_distances = torch.abs(unproj_unfold_k_rang - unproj_range)

    # get_gaussian_kernel (KNN.py:11-33)
    x_coord = torch.arange(search)
    x_grid = x_coord.repeat(search).view(search, search)
    y_grid = x_grid.t()
    xy_grid = torch.stack([x_grid, y_grid], dim=-1).float()
    mean = (search - 1) / 2.0
    variance = sigma ** 2.0
    g = (1.0 / (2.0 * math.pi * variance)) * torch.exp(
        -torch.sum((xy_grid - mean) ** 2.0, dim=-1) / (2 * variance))
    g = g / torch.sum(g)
    inv_gauss_k = (1 - g).view(1, -1, 1).type(proj_range.type())

    k2_distances = k2_distances * inv_gauss_k
    _, knn_idx = k2_distances.topk(knn, dim=1, largest=False, sorted=False)
    proj_unfold_1_argmax = F.unfold(proj_argmax[None, None, ...].float(),
                                    kernel_size=(search, search),
                                    padding=(pad, pad)).long()
    unproj_unfold_1_argmax = proj_unfold_1_argmax[:, :, idx_list]
    knn_argmax = torch.gather(input=unproj_unfold_1_argmax, dim=1,
                              index=knn_idx)
    if cutoff > 0:
        knn_distances = torch.gather(input=k2_distances, dim=1, index=knn_idx)
        knn_argmax[knn_distances > cutoff] = nclasses
    knn_argmax_onehot = torch.zeros(
        (1, nclasses + 1, P[0])).type(proj_range.type())
    ones = torch.ones_like(knn_argmax).type(proj_range.type())
    knn_argmax_onehot = knn_argmax_onehot.scatter_add_(1, knn_argmax, ones)
    out = knn_argmax_onehot[:, 1:-1].argmax(dim=1) + 1
    return out.view(P).numpy()


def _scene(rng, h=16, w=64, p=300, nclasses=20):
    proj_range = rng.uniform(1.0, 60.0, (h, w)).astype(np.float32)
    proj_range[rng.uniform(size=(h, w)) < 0.15] = -1.0   # invalid pixels
    proj_argmax = rng.integers(0, nclasses, (h, w)).astype(np.int64)
    px = rng.integers(0, w, p).astype(np.int64)
    py = rng.integers(0, h, p).astype(np.int64)
    base = proj_range[py, px]
    unproj_range = np.where(
        base > 0, base + rng.normal(0, 0.3, p), rng.uniform(1, 60, p)
    ).astype(np.float32)
    return proj_range, unproj_range, proj_argmax, px, py


def test_gaussian_kernel_matches_reference():
    got = gaussian_kernel(5, 1.0)
    x_coord = torch.arange(5)
    x_grid = x_coord.repeat(5).view(5, 5)
    xy = torch.stack([x_grid, x_grid.t()], dim=-1).float()
    g = (1.0 / (2.0 * math.pi)) * torch.exp(
        -torch.sum((xy - 2.0) ** 2.0, dim=-1) / 2.0)
    want = (g / g.sum()).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_knn_postprocess_matches_torch_twin(rng):
    proj_range, unproj_range, proj_argmax, px, py = _scene(rng)
    want = torch_knn(proj_range, unproj_range, proj_argmax, px, py)
    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_argmax), jnp.asarray(px), jnp.asarray(py)))
    assert (got == want).mean() > 0.999   # topk tie-order differences only
    assert got.min() >= 1 and got.max() <= 19


def test_knn_postprocess_cutoff_and_params(rng):
    """Non-default params (knn 3, search 3, tight cutoff) still match."""
    proj_range, unproj_range, proj_argmax, px, py = _scene(rng, p=200)
    want = torch_knn(proj_range, unproj_range, proj_argmax, px, py,
                     knn=3, search=3, sigma=2.0, cutoff=0.5)
    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_argmax), jnp.asarray(px), jnp.asarray(py),
        knn=3, search=3, sigma=2.0, cutoff=0.5))
    assert (got == want).mean() > 0.995


def test_per_point_dispatch(rng):
    """use_knn=False is the shipped config's plain pixel indexing
    (user.py:161)."""
    proj_range, unproj_range, proj_argmax, px, py = _scene(rng, p=50)
    got = np.asarray(per_point_labels(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_argmax), jnp.asarray(px), jnp.asarray(py)))
    np.testing.assert_array_equal(got, proj_argmax[py, px])
