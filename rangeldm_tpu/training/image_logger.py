"""Training-time image/sample dumps (ImageLogger + per-epoch sampling
parity: vae/main.py:309-477, ldm/train_unconditional.py:597-652).

Writes PNG grids of range/intensity channels and BEV density images so
training can be eyeballed the same way the reference's loggers allow.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _to_u8(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)


def save_range_image_grid(images: np.ndarray, path: str,
                          mean: float = 20.0, std: float = 40.0,
                          range_fill: float = 100.0,
                          max_images: int = 8) -> None:
    """(B, H, W, C) normalized range images -> one stacked PNG
    (range rows then intensity rows)."""
    from PIL import Image
    images = np.asarray(images[:max_images], np.float32)
    r = (images[..., 0] * std + mean) / range_fill
    rows = [r[i] for i in range(images.shape[0])]
    if images.shape[-1] > 1:
        rows += [images[i, ..., 1] for i in range(images.shape[0])]
    grid = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(_to_u8(grid), mode="L").save(path)


def save_bev_png(bev_density: np.ndarray, path: str) -> None:
    """(Gy, Gx) BEV density -> PNG (ldm/inference.py:178-180 style)."""
    from PIL import Image
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(_to_u8(np.asarray(bev_density)), mode="L").save(path)


class ImageLogger:
    """Log reconstruction/sample grids every `every` steps with the
    reference's log-scale early-step frequency (vae/main.py:329-331,
    increase_log_steps)."""

    def __init__(self, out_dir: str, every: int = 1000,
                 increase_log_steps: bool = True, max_images: int = 8,
                 mean: float = 20.0, std: float = 40.0,
                 suffix: str = ""):
        self.out_dir = out_dir
        self.every = every
        self.max_images = max_images
        self.mean, self.std = mean, std
        # multi-host runs pass a per-process suffix (e.g. "_p0"): every
        # process dumps its OWN batch slice, so a shared output_dir would
        # otherwise have all processes racing on the same PNG path
        self.suffix = suffix
        # reference log-scale early steps: 1, 2, 4, ..., up to `every`
        # (vae/main.py:329-331 log_steps = [2**n for n in range(log2(freq))])
        import math
        self.steps = ({2 ** n for n in
                       range(int(math.log2(max(every, 1))) + 1)}
                      if increase_log_steps else set())
        self.steps |= {1}

    def should_log(self, step: int) -> bool:
        return step % self.every == 0 or step in self.steps

    def log(self, step: int, **named_images) -> None:
        for name, imgs in named_images.items():
            save_range_image_grid(
                np.asarray(imgs), os.path.join(
                    self.out_dir, f"{name}_step{step:08d}{self.suffix}.png"),
                mean=self.mean, std=self.std, max_images=self.max_images)
