"""Range image -> point cloud inverse projection.

Re-implements `point_cloud_to_range_image.to_pc_torch` (ldm/dataset.py:228-277)
and the vanilla variant (ldm/kitti360_range_image_vanilla.py:34-81) as pure
jittable JAX functions over the canonical (B, H=beams, W=azimuth, C) layout.

The per-beam geometry (KITTI/nuScenes tables) and the uniform-zenith geometry
collapse into one formula because `z = height + r * sin(zenith)` with
height == 0 for the uniform spec; incl = -zenith so the reference's
`z = height - r * sin(incl)` (ldm/dataset.py:258) is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.geometry.sensors import SensorSpec
from rangeldm_tpu.geometry.projection import decode_range


@functools.partial(jax.jit, static_argnames=("spec",))
def to_point_cloud(images: jnp.ndarray, spec: SensorSpec) -> jnp.ndarray:
    """(B, H, W, C>=1) range images -> (B, H*W, 3 or 4) point clouds.

    Channel 0 is the normalized/encoded range, channel 1 (if present) the
    remission copied through verbatim. For the table specs negative decoded
    ranges snap to the fill value (ldm/dataset.py:255); the vanilla/uniform
    spec keeps them, matching its own to_pc_torch which performs no snap
    (ldm/kitti360_range_image_vanilla.py:34-81).
    """
    b, h, w, c = images.shape
    r = decode_range(images[..., 0], spec, xp=jnp)       # (B, H, W)
    if spec.row_mode != "uniform":
        r = jnp.where(r < 0, spec.range_fill, r)

    zenith = jnp.asarray(spec.zenith)                     # (H,)
    height = jnp.asarray(spec.height)                     # (H,)
    # azimuth of column j (ldm/dataset.py:265)
    # column table in f32: building it in a low-precision input dtype would
    # quantize the indices themselves (bf16 rounds 512..1023 to multiples
    # of 4 -> ~0.6 m lateral error at 50 m)
    azi = ((w - 0.5 - jnp.arange(w, dtype=jnp.float32)) / w * 2.0 * jnp.pi
           - jnp.pi).astype(jnp.promote_types(images.dtype, jnp.float32))

    z = height[None, :, None] + r * jnp.sin(zenith)[None, :, None]
    xy = r * jnp.cos(zenith)[None, :, None]
    x = xy * jnp.cos(azi)[None, None, :]
    y = xy * jnp.sin(azi)[None, None, :]

    cols = [x.reshape(b, -1), y.reshape(b, -1), z.reshape(b, -1)]
    if c > 1:
        cols.append(images[..., 1].reshape(b, -1))
    return jnp.stack(cols, axis=2)


@functools.partial(jax.jit, static_argnames=("spec", "max_depth"))
def to_point_cloud_masked(images: jnp.ndarray, spec: SensorSpec,
                          max_depth: float = 90.0):
    """Point cloud + validity mask for depth < max_depth (the export filter
    used by ldm/inference.py:173-177)."""
    pc = to_point_cloud(images, spec)
    depth = jnp.linalg.norm(pc[..., :3], axis=-1)
    return pc, depth < max_depth
