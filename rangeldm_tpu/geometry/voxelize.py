"""BEV voxelization via trilinear splatting.

Re-implements `_splat_points_to_volumes` + `to_voxel`
(ldm/dataset.py:13-132, 279-294) with `jnp..at[].add` segment sums — the
TPU-native replacement for CUDA `scatter_add_`. The 8-corner loop is unrolled
at trace time so XLA fuses the weight computation into the scatters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rangeldm_tpu.geometry.sensors import SensorSpec
from rangeldm_tpu.geometry.inverse import to_point_cloud


def splat_points_to_volumes(points_3d: jnp.ndarray,
                            points_features: jnp.ndarray,
                            grid_sizes: tuple,
                            min_weight: float = 1e-4,
                            mask: jnp.ndarray | None = None):
    """Trilinear-splat (B, N, 3) points in [-1, 1]^3 into a flattened volume.

    grid_sizes is (D, H, W) as in the reference. Returns
    (features (B, F, n_voxels), densities (B, n_voxels, 1)).
    Out-of-bounds corners contribute zero weight (the reference adds them to
    a random voxel with weight 0 — ldm/dataset.py:110-111; we just mask).
    """
    d, h, w = grid_sizes
    n_voxels = d * h * w
    ba, n_points, feat_dim = points_features.shape

    gs_xyz = jnp.array([w, h, d], dtype=points_3d.dtype)   # grid_sizes[[2,1,0]]
    idx_f = (points_3d + 1.0) * 0.5 * (gs_xyz[None, None, :] - 1.0)
    base = jnp.floor(idx_f)
    rem = idx_f - base                                      # (B, N, 3)
    base = base.astype(jnp.int32)

    densities = jnp.zeros((ba, n_voxels), dtype=points_3d.dtype)
    features = jnp.zeros((ba, n_voxels, feat_dim), dtype=points_3d.dtype)

    for xd in (0, 1):
        wx = (1 - xd) + (2 * xd - 1) * rem[..., 0]
        xi = base[..., 0] + xd
        for yd in (0, 1):
            wy = (1 - yd) + (2 * yd - 1) * rem[..., 1]
            yi = base[..., 1] + yd
            for zd in (0, 1):
                wz = (1 - zd) + (2 * zd - 1) * rem[..., 2]
                zi = base[..., 2] + zd
                wgt = wx * wy * wz
                valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) &
                         (zi >= 0) & (zi < d))
                if mask is not None:
                    valid = valid & mask
                wgt = jnp.where(valid, wgt, 0.0)
                # linear index (Z * H + Y) * W + X (ldm/dataset.py:106-108)
                lin = (zi * h + yi) * w + xi
                lin = jnp.where(valid, lin, 0)
                densities = jax.vmap(
                    lambda dn, ix, wt: dn.at[ix].add(wt))(densities, lin, wgt)
                features = jax.vmap(
                    lambda ft, ix, up: ft.at[ix].add(up))(
                        features, lin, wgt[..., None] * points_features)

    features = features / jnp.clip(densities[..., None], min_weight, None)
    # return in the reference's layouts: (B, F, V) and (B, V, 1)
    return jnp.swapaxes(features, 1, 2), densities[..., None]


@functools.partial(jax.jit, static_argnames=("spec", "normalize_densities"))
def to_voxel(images: jnp.ndarray, spec: SensorSpec,
             normalize_densities: bool = True) -> jnp.ndarray:
    """Range images (B, H, W, C) -> BEV voxel grid (B, 2, *grid_sizes[1:])
    with channels [log-density, mean-intensity] (ldm/dataset.py:279-294).

    With the default grid_sizes (1, Gy, Gx) the output is (B, 2, Gy, Gx).
    """
    b = images.shape[0]
    pc = to_point_cloud(images, spec)
    lo = jnp.array(spec.pc_range[:3], dtype=pc.dtype)
    hi = jnp.array(spec.pc_range[3:], dtype=pc.dtype)
    xyz = (pc[..., :3] - (hi + lo) / 2.0) / ((hi - lo) / 2.0)
    feats = pc[..., 3:] if pc.shape[-1] > 3 else jnp.ones(pc.shape[:2] + (1,), pc.dtype)

    features, densities = splat_points_to_volumes(xyz, feats, tuple(spec.grid_sizes))
    if normalize_densities:
        densities = jnp.log(densities + 1.0)
    d, h, w = spec.grid_sizes
    dens = densities.reshape(b, d, h, w)
    feat = features.reshape(b, d, h, w)
    return jnp.concatenate([dens, feat], axis=1)
