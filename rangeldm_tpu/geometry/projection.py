"""Point cloud -> range image projection (the L0 domain core).

Re-implements the semantics of the reference's `point_cloud_to_range_image`
(ldm/dataset.py:135-226) plus its dataset-specific row assignments
(ldm/kitti360_range_image.py:51-61, ldm/nuscenes_range_image.py:43-45,
ldm/kitti360_range_image_vanilla.py:24-32) in two flavours:

  * `project_np` — numpy host path, bit-faithful to the reference (same
    clamping, same descending-range overwrite semantics) for dataset caching
    and golden tests.
  * `project` — jittable JAX device path over a fixed-size padded point
    buffer. Nearest-point-wins rasterization is done with two deterministic
    scatter-mins (float32 range bit-cast to int32 is order-preserving for
    non-negative floats); ties on range break to the smallest point index.
    The reference's tie-break is np.argsort-order dependent (unstable
    quicksort) i.e. effectively arbitrary; ours is deterministic and
    metric-equivalent.

Output range-image layout here is (H=beams, W=azimuth, 2) with channel 0 the
encoded range and channel 1 the intensity; -1 marks empty pixels before hole
filling, mirroring ldm/dataset.py:167.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.geometry.sensors import SensorSpec

_INT32_MAX = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Row / column assignment
# ---------------------------------------------------------------------------

def _col_inds_np(pc: np.ndarray, width: int) -> np.ndarray:
    """Azimuth -> column binning (ldm/dataset.py:162-166)."""
    azi = np.arctan2(pc[:, 1], pc[:, 0])
    col = width - 1.0 + 0.5 - (azi + np.pi) / (2.0 * np.pi) * width
    col = np.round(col).astype(np.int32)
    col[col == width] = width - 1
    col[col < 0] = 0
    return col


def _row_inds_np(pc: np.ndarray, spec: SensorSpec) -> np.ndarray:
    if spec.row_mode == "kitti":
        # argmin over per-beam |incl - atan2(h - z, ||xy||)|
        # (ldm/kitti360_range_image.py:51-61)
        xy_norm = np.linalg.norm(pc[:, :2], ord=2, axis=1)
        incl = spec.incl[None, :]                            # (1, B)
        ang = np.arctan2(spec.height[None, :] - pc[:, 2:3], xy_norm[:, None])
        return np.argmin(np.abs(incl - ang), axis=-1).astype(np.int32)
    if spec.row_mode == "ring":
        # row index straight from the ring channel (ldm/nuscenes_range_image.py:43-45)
        return (spec.n_beams - 1 - pc[:, 4]).astype(np.int32)
    if spec.row_mode == "uniform":
        # LiDARGen binning (ldm/kitti360_range_image_vanilla.py:24-32)
        r = np.linalg.norm(pc[:, :3], axis=1, ord=2)
        zen = np.arcsin(pc[:, 2] / np.maximum(r, 1e-12))
        fov = spec.fov_up - spec.fov_down
        row = spec.n_beams - 1.0 + 0.5 - (zen - spec.fov_down) / fov * spec.n_beams
        row = np.round(row).astype(np.int32)
        row[row == spec.n_beams] = spec.n_beams - 1
        row[row < 0] = 0
        return row
    raise ValueError(f"unknown row_mode {spec.row_mode}")


def encode_range(r, spec: SensorSpec, xp=np):
    """Range value encoding (ldm/dataset.py:173-178)."""
    if spec.log:
        return xp.log2(r + 1.0) / 6.0
    if spec.inverse:
        return 1.0 / r
    return r


def decode_log_range(v):
    """The LiDARGen log-range decode 2^(6v) - 1 (ldm/dataset.py:241,
    lidar_utils.py:232, metrics mae.py:60-62) — ONE definition shared by
    decode_range, the MAE metrics, and the .bin export path."""
    return 2.0 ** (v * 6.0) - 1.0


def decode_range(v, spec: SensorSpec, xp=jnp):
    """Inverse of `encode_range` plus the normalization undo
    (ldm/dataset.py:241-245)."""
    if spec.log:
        return decode_log_range(v)
    if spec.inverse:
        return 1.0 / xp.maximum(v, 1e-4)
    return v * spec.std + spec.mean


# ---------------------------------------------------------------------------
# numpy host path (bit-faithful)
# ---------------------------------------------------------------------------

def project_np(pc: np.ndarray, spec: SensorSpec) -> np.ndarray:
    """pc (N, >=4) -> range image (H, W, 2) with -1 in empty pixels.

    Matches ldm/dataset.py:159-185 exactly (including the in-place z shift
    and far-to-near ordering), modulo unstable-sort tie order.
    """
    pc = np.array(pc, dtype=np.float32, copy=True)
    if spec.min_depth > 0.0:
        depth = np.linalg.norm(pc[:, :3], 2, axis=1)
        pc = pc[depth > spec.min_depth]
    row = _row_inds_np(pc, spec)
    col = _col_inds_np(pc, spec.width)

    img = np.full((spec.n_beams, spec.width, 2), -1.0, dtype=np.float32)
    pc[:, 2] -= spec.height[row]
    r = np.linalg.norm(pc[:, :3], axis=1, ord=2)
    r = np.minimum(r, spec.range_fill)

    order = np.argsort(-r, kind="stable")
    r_enc = encode_range(r[order], spec, xp=np)
    pc = pc[order]
    img[row[order], col[order], 0] = r_enc
    img[row[order], col[order], 1] = pc[:, 3]
    return img


def fill_noise_np(data: np.ndarray, miss: np.ndarray) -> np.ndarray:
    """Shift-by-one-column azimuth copy into missing pixels
    (ldm/dataset.py:187-191). data is (H, W, C); miss is (H, W) bool."""
    shifted = np.roll(data, -1, axis=1)
    out = data.copy()
    out[miss] = shifted[miss]
    return out


def process_miss_value_np(img: np.ndarray, spec: SensorSpec):
    """Hole filling + car-window mask (ldm/dataset.py:193-221).

    Returns (img, mask, car_window_mask); img's remaining holes carry the
    encoded fill value.
    """
    mask = img[..., 0] > 0
    miss = img[..., 0] == -1
    img = fill_noise_np(img, miss)
    mask = fill_noise_np(mask[..., None], miss).squeeze(-1)

    still = img[..., 0] == -1
    down2 = np.roll(img[..., 0], 2, axis=0)
    up2 = np.roll(img[..., 0], -2, axis=0)
    right2 = np.roll(img[..., 0], 2, axis=1)
    left2 = np.roll(img[..., 0], -2, axis=1)
    car_window = still & ((down2 != -1) | (up2 != -1) | (right2 != -1) | (left2 != -1))

    fill = np.array([float(encode_range(np.float32(spec.range_fill), spec, xp=np)),
                     spec.intensity_fill], dtype=np.float32)
    img[still] = fill
    return img, mask, car_window


def normalize_np(img: np.ndarray, spec: SensorSpec) -> np.ndarray:
    """(r - mean) / std on the range channel (ldm/dataset.py:223-226)."""
    img = img.copy()
    if not spec.log and not spec.inverse:
        img[..., 0] = (img[..., 0] - spec.mean) / spec.std
    return img


def range_image_np(pc: np.ndarray, spec: SensorSpec):
    """Full host pipeline: project + fill + normalize.

    Returns (img (H, W, 2) float32, mask (H, W) bool, car_window (H, W) bool).
    """
    img = project_np(pc, spec)
    img, mask, car_window = process_miss_value_np(img, spec)
    img = normalize_np(img, spec)
    return img, mask, car_window


# ---------------------------------------------------------------------------
# JAX device path (jittable, fixed-size)
# ---------------------------------------------------------------------------

def pad_points(pc: np.ndarray, n_max: int):
    """Pad/truncate (N, C) points to (n_max, C) + validity mask for `project`."""
    n = min(pc.shape[0], n_max)
    out = np.zeros((n_max, pc.shape[1]), dtype=np.float32)
    out[:n] = pc[:n]
    valid = np.zeros((n_max,), dtype=bool)
    valid[:n] = True
    return out, valid


@functools.partial(jax.jit, static_argnames=("spec",))
def project(points: jnp.ndarray, valid: jnp.ndarray, spec: SensorSpec):
    """Jittable projection: (N, >=4) padded points -> (H, W, 2) range image.

    Deterministic nearest-wins scatter; empty pixels are -1. See module
    docstring for tie-break semantics vs the reference.
    """
    h, w = spec.n_beams, spec.width
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    intensity = points[:, 3]

    if spec.min_depth > 0.0:
        depth = jnp.sqrt(x * x + y * y + z * z)
        valid = valid & (depth > spec.min_depth)

    # row assignment
    if spec.row_mode == "kitti":
        xy_norm = jnp.sqrt(x * x + y * y)
        incl = jnp.asarray(spec.incl)                        # (B,)
        heights = jnp.asarray(spec.height)                   # (B,)
        ang = jnp.arctan2(heights[None, :] - z[:, None], xy_norm[:, None])
        row = jnp.argmin(jnp.abs(incl[None, :] - ang), axis=-1).astype(jnp.int32)
    elif spec.row_mode == "ring":
        row = (spec.n_beams - 1 - points[:, 4]).astype(jnp.int32)
    elif spec.row_mode == "uniform":
        r0 = jnp.sqrt(x * x + y * y + z * z)
        zen = jnp.arcsin(z / jnp.maximum(r0, 1e-12))
        fov = spec.fov_up - spec.fov_down
        rowf = spec.n_beams - 0.5 - (zen - spec.fov_down) / fov * spec.n_beams
        row = jnp.clip(jnp.round(rowf).astype(jnp.int32), 0, spec.n_beams - 1)
    else:
        raise ValueError(spec.row_mode)

    # column assignment
    azi = jnp.arctan2(y, x)
    colf = w - 0.5 - (azi + jnp.pi) / (2.0 * jnp.pi) * w
    col = jnp.clip(jnp.round(colf).astype(jnp.int32), 0, w - 1)

    # range with beam-origin z shift
    z_shift = z - jnp.asarray(spec.height)[row]
    r = jnp.sqrt(x * x + y * y + z_shift * z_shift)
    r = jnp.minimum(r, spec.range_fill)

    pix = row * w + col
    pix = jnp.where(valid, pix, 0)

    # scatter-min #1: winning range per pixel.
    # For r >= 0 the float32 bit pattern is monotone as int32.
    rbits = jax.lax.bitcast_convert_type(r.astype(jnp.float32), jnp.int32)
    rbits = jnp.where(valid, rbits, _INT32_MAX)
    best_r = jnp.full((h * w,), _INT32_MAX, jnp.int32).at[pix].min(
        rbits, mode="drop")

    # scatter-min #2: smallest point index among range winners.
    won = valid & (rbits == best_r[pix])
    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    cand = jnp.where(won, idx, _INT32_MAX)
    winner = jnp.full((h * w,), _INT32_MAX, jnp.int32).at[pix].min(
        cand, mode="drop")

    hit = winner != _INT32_MAX
    widx = jnp.where(hit, winner, 0)
    r_enc = encode_range(r, spec, xp=jnp)
    out_r = jnp.where(hit, r_enc[widx], -1.0)
    out_i = jnp.where(hit, intensity[widx], -1.0)
    img = jnp.stack([out_r, out_i], axis=-1).reshape(h, w, 2)
    return img


@functools.partial(jax.jit, static_argnames=("spec",))
def process_miss_value(img: jnp.ndarray, spec: SensorSpec):
    """Jittable hole filling (see process_miss_value_np)."""
    mask = img[..., 0] > 0
    miss = img[..., 0] == -1
    shifted = jnp.roll(img, -1, axis=1)
    img = jnp.where(miss[..., None], shifted, img)
    mask = jnp.where(miss, jnp.roll(mask, -1, axis=1), mask)

    rch = img[..., 0]
    still = rch == -1
    neigh = ((jnp.roll(rch, 2, axis=0) != -1) | (jnp.roll(rch, -2, axis=0) != -1) |
             (jnp.roll(rch, 2, axis=1) != -1) | (jnp.roll(rch, -2, axis=1) != -1))
    car_window = still & neigh

    fill_r = float(encode_range(np.float32(spec.range_fill), spec, xp=np))
    fill = jnp.array([fill_r, spec.intensity_fill], dtype=img.dtype)
    img = jnp.where(still[..., None], fill, img)
    return img, mask, car_window


@functools.partial(jax.jit, static_argnames=("spec",))
def normalize(img: jnp.ndarray, spec: SensorSpec) -> jnp.ndarray:
    if spec.log or spec.inverse:
        return img
    r = (img[..., :1] - spec.mean) / spec.std
    return jnp.concatenate([r, img[..., 1:]], axis=-1)


@functools.partial(jax.jit, static_argnames=("spec",))
def range_image(points: jnp.ndarray, valid: jnp.ndarray, spec: SensorSpec):
    """Fused device pipeline: project + fill + normalize (batched via vmap
    upstream). Returns (img, mask, car_window)."""
    img = project(points, valid, spec)
    img, mask, car_window = process_miss_value(img, spec)
    return normalize(img, spec), mask, car_window
