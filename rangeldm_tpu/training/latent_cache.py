"""Latent-moments caching for frozen-VAE LDM training.

The reference re-encodes every batch through the frozen VAE each step
(ldm/train_unconditional.py:480-481) — 33 ms of the 93 ms train step at
batch 32 on v5e (BENCHMARKS.md). The posterior MOMENTS (mean, logvar) are
a deterministic function of the image under the frozen VAE, so they can be
computed once per dataset and reused every epoch; the per-step
stochasticity (`latent_dist.sample()`) stays in the train step, which
draws from the cached moments with its own RNG. Semantics are exactly the
reference's — only the redundant encoder forwards are removed.

Moments are 4x smaller than the raw range image (h/4, w/4, 2z), stored as
an .npy memmap next to the run so multi-epoch jobs pay one encode pass.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class MomentsDataset:
    """Index-compatible dataset view over a precomputed moments array;
    plugs into RangeLoader (shuffle/sharding/prefetch all reused)."""

    def __init__(self, moments: np.ndarray):
        self.moments = moments

    def __len__(self) -> int:
        return len(self.moments)

    def __getitem__(self, i: int):
        return {"moments": np.asarray(self.moments[i], np.float32)}


def precompute_moments(vae, vae_params, dataset, batch_size: int = 32,
                       out_path: Optional[str] = None,
                       tag: str = "", log=None) -> np.ndarray:
    """One ordered encode pass over `dataset` -> (N, h, w, 2z) float32.

    With `out_path` the result is a reusable .npy memmap; a sidecar
    `<out_path>.json` records {n, tag} and the cache is only reused when
    both match (pass the VAE checkpoint path/fingerprint as `tag`)."""
    n = len(dataset)
    meta = {"n": n, "tag": tag}
    if out_path and os.path.exists(out_path):
        try:
            with open(out_path + ".json") as f:
                if json.load(f) == meta:
                    if log:
                        log(f"[latent-cache] reusing {out_path}")
                    return np.load(out_path, mmap_mode="r")
        except Exception:
            pass

    encode = jax.jit(
        lambda x: vae.apply(vae_params, x, method="encode_moments"))
    moments = None
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        imgs = np.stack([np.asarray(dataset[i]["jpg"], np.float32)
                         for i in range(start, stop)])
        pad = batch_size - len(imgs)
        if pad:      # keep one compiled shape for the ragged last batch
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        m = np.asarray(encode(jnp.asarray(imgs)), np.float32)[:stop - start]
        if moments is None:
            shape = (n,) + m.shape[1:]
            if out_path:
                moments = np.lib.format.open_memmap(
                    out_path, mode="w+", dtype=np.float32, shape=shape)
            else:
                moments = np.empty(shape, np.float32)
        moments[start:stop] = m
        if log and (start // batch_size) % 50 == 0:
            log(f"[latent-cache] encoded {stop}/{n}")
    if out_path:
        moments.flush()
        with open(out_path + ".json", "w") as f:
            json.dump(meta, f)
    return moments
