"""Golden-value regression pins for the geometry pipeline.

These pin aggregate statistics of a fixed synthetic scan through the full
host pipeline so accidental semantic drift (padding, ordering, fill values,
normalization) is caught across rounds. Values computed 2026-08-16 on the
numpy reference path (bit-faithful to ldm/dataset.py); loose tolerances
absorb BLAS/libm variation across hosts, tight enough to catch logic
changes.
"""

import numpy as np
import jax.numpy as jnp

from rangeldm_tpu.geometry import (
    get_spec, range_image_np, to_point_cloud, to_voxel,
)
from conftest import synthetic_scan


def fixed_scan():
    return synthetic_scan(np.random.default_rng(42), n=10000)


def test_projection_pipeline_golden():
    spec = get_spec("kitti360")
    img, mask, cw = range_image_np(fixed_scan(), spec)
    np.testing.assert_allclose(img.sum(), 114222.96, rtol=1e-4)
    np.testing.assert_allclose(np.abs(img).mean(), 0.8850631, rtol=1e-4)
    # scatter winners / masks are integers; allow a few boundary flips
    assert abs(int(mask.sum()) - 16987) <= 8
    assert abs(int(cw.sum()) - 33036) <= 16


def test_inverse_projection_golden():
    spec = get_spec("kitti360")
    img, _, _ = range_image_np(fixed_scan(), spec)
    pc = np.asarray(to_point_cloud(jnp.asarray(img[None]), spec))
    np.testing.assert_allclose(pc.mean(), -3.5465579, rtol=1e-3)


def test_voxelize_golden():
    spec = get_spec("kitti360", grid_sizes=(1, 64, 64))
    img, _, _ = range_image_np(fixed_scan(), spec)
    vox = np.asarray(to_voxel(jnp.asarray(img[None]), spec))
    np.testing.assert_allclose(vox.sum(), 5141.612, rtol=1e-3)
