"""FRD end-to-end harness (X5/X7 equivalent of the RangeNet++ inference run
orchestrated by metrics/metric.py:15-24, 99-135).

Projects generated .bin point clouds and reference scans with the
LiDARGen-style LaserScan projection (metrics histogram.py:210-270: uniform
fov +3/-25, floor binning, descending-depth overwrite), feeds them through
the darknet53 RangeNet (loading the released checkpoint), and computes the
Frechet distance over decoder features.
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.metrics.frd import compute_frd
from rangeldm_tpu.metrics.rangenet import (
    KITTI_IMG_MEANS, KITTI_IMG_STDS, RangeNet, convert_rangenet_state_dict,
    preprocess_scan,
)


def laserscan_project(points: np.ndarray, remissions: np.ndarray,
                      h: int = 64, w: int = 1024,
                      fov_up_deg: float = 3.0, fov_down_deg: float = -25.0):
    """semantic-kitti LaserScan.do_range_projection (histogram.py:210-270):
    floor binning, clamp, descending-depth ordering so the nearest point
    wins. Returns (proj_range, proj_xyz, proj_remission, proj_mask)."""
    fov_up = fov_up_deg / 180.0 * np.pi
    fov_down = fov_down_deg / 180.0 * np.pi
    fov = abs(fov_down) + abs(fov_up)

    depth = np.linalg.norm(points, 2, axis=1)
    yaw = -np.arctan2(points[:, 1], points[:, 0])
    pitch = np.arcsin(points[:, 2] / np.maximum(depth, 1e-12))

    px = np.floor(0.5 * (yaw / np.pi + 1.0) * w)
    px = np.clip(px, 0, w - 1).astype(np.int32)
    py = np.floor((1.0 - (pitch + abs(fov_down)) / fov) * h)
    py = np.clip(py, 0, h - 1).astype(np.int32)

    order = np.argsort(depth)[::-1]
    proj_range = np.full((h, w), -1, np.float32)
    proj_xyz = np.full((h, w, 3), -1, np.float32)
    proj_rem = np.full((h, w), -1, np.float32)
    proj_idx = np.full((h, w), -1, np.int32)
    proj_range[py[order], px[order]] = depth[order]
    proj_xyz[py[order], px[order]] = points[order]
    proj_rem[py[order], px[order]] = remissions[order]
    proj_idx[py[order], px[order]] = np.arange(len(depth))[order]
    proj_mask = (proj_idx > 0).astype(np.float32)
    return proj_range, proj_xyz, proj_rem, proj_mask


def load_rangenet(model_dir: str):
    """Load the released darknet53-1024 checkpoint (backbone /
    segmentation_decoder / optional segmentation_head torch files)."""
    from rangeldm_tpu.convert.torch_common import load_torch_state_dict

    def find(name):
        for cand in (name, name + ".pth", name + ".pytorch"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                return load_torch_state_dict(p)
        return None

    backbone = find("backbone")
    decoder = find("segmentation_decoder")
    head = find("segmentation_head")
    if backbone is None or decoder is None:
        raise FileNotFoundError(
            f"backbone/segmentation_decoder not found in {model_dir}")
    variables = convert_rangenet_state_dict(backbone, decoder, head)
    model = RangeNet(with_head=head is not None)
    return model, variables


def extract_features(model: RangeNet, variables, scans: Iterable[np.ndarray],
                     batch_size: int = 8) -> np.ndarray:
    """scans: iterable of (N, 4) point clouds -> (n, 64, 1024, 32)."""
    @jax.jit
    def fwd(x):
        feats, _ = model.apply(variables, x)
        return feats

    inputs, feats = [], []

    def flush():
        if not inputs:
            return
        batch = jnp.asarray(np.stack(inputs))
        feats.append(np.asarray(fwd(batch), np.float32))
        inputs.clear()

    for pc in scans:
        pr, pxyz, prem, pm = laserscan_project(pc[:, :3], pc[:, 3])
        inputs.append(preprocess_scan(pr, pxyz, prem, pm))
        if len(inputs) == batch_size:
            flush()
    flush()
    return np.concatenate(feats) if feats else np.zeros((0, 64, 1024, 32))


def compute_frd_for_dirs(sample_dir: str, reference_files: List[str],
                         rangenet_dir: Optional[str],
                         limit: int = 1000) -> float:
    if rangenet_dir is None:
        raise ValueError("--rangenet checkpoint dir required for FRD")
    model, variables = load_rangenet(rangenet_dir)

    def gen_scans():
        for f in sorted(glob.glob(os.path.join(sample_dir, "*.bin")))[:limit]:
            yield np.fromfile(f, np.float32).reshape(-1, 4)

    def ref_scans():
        for f in reference_files[:limit]:
            yield np.fromfile(f, np.float32).reshape(-1, 4)

    gen_feats = extract_features(model, variables, gen_scans())
    ref_feats = extract_features(model, variables, ref_scans())
    return compute_frd(gen_feats, ref_feats)
