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


def params_fingerprint(params) -> str:
    """Content hash of a params pytree (used as the cache tag so a
    retrained VAE at the same checkpoint path invalidates the cache)."""
    import hashlib
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(a.tobytes()[:1 << 16])
    return h.hexdigest()[:24]


def dataset_fingerprint(dataset) -> str:
    """Content hash of the dataset's *identity*: the sorted file list when
    the dataset exposes one (RangeImageDataset.files) PLUS its projection
    config (`cfg`, a DatasetConfig — sensor/width/encoding/mean/std all
    change the encoded moments), else its repr — so a cache is never
    silently reused for a different file set OR a renormalized projection
    of the same files."""
    import hashlib
    files = getattr(dataset, "files", None)
    if files is not None:
        blob = "\n".join(sorted(str(f) for f in files))
        blob += "\n" + repr(getattr(dataset, "cfg", ""))
    else:
        blob = f"{type(dataset).__qualname__}:{len(dataset)}"
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def precompute_moments(vae, vae_params, dataset, batch_size: int = 32,
                       out_path: Optional[str] = None,
                       tag: str = "", log=None,
                       data_tag: Optional[str] = None,
                       mesh=None) -> np.ndarray:
    """One ordered encode pass over `dataset` -> (N, h, w, 2z) float32.

    With `out_path` the result is a reusable .npy written atomically
    (tmp + os.replace — concurrent multi-host writers on a shared
    filesystem each produce a complete file, last one wins, never a
    truncated memmap); a sidecar `<out_path>.json` records {n, tag, shape}
    and the cache is only reused when all match, including a dataset
    fingerprint (hash of the sorted file list) so a different data.root
    with the same sample count can never silently reuse stale latents.
    Pass a CONTENT fingerprint of the VAE (params_fingerprint) as `tag` —
    a path string goes stale when the checkpoint is retrained in place.

    The pass streams through a threaded RangeLoader so projection I/O
    overlaps the device encodes."""
    n = len(dataset)
    if n == 0:
        raise ValueError("precompute_moments: dataset is empty "
                         "(check data.root)")
    if data_tag is None:
        data_tag = dataset_fingerprint(dataset)
    if out_path and os.path.exists(out_path):
        try:
            with open(out_path + ".json") as f:
                meta = json.load(f)
            cached = np.load(out_path, mmap_mode="r")
            if (meta.get("n") == n and meta.get("tag") == tag
                    and meta.get("data_tag") == data_tag
                    and tuple(meta.get("shape", ())) == cached.shape):
                if log:
                    log(f"[latent-cache] reusing {out_path}")
                return cached
        except Exception:
            pass

    from rangeldm_tpu.data.datasets import RangeLoader
    # shard each encode batch over the training mesh (single-host): with
    # replicated params and an unsharded batch every chip would redundantly
    # encode the FULL batch — N x the necessary FLOPs for a pass whose
    # whole point is saving encoder time. Multi-host keeps the simple
    # every-process-full-pass behavior (the cache write is atomic,
    # last-complete-file-wins).
    in_shd = None
    if (mesh is not None and mesh.size > 1 and jax.process_count() == 1
            and batch_size % mesh.size == 0):
        from rangeldm_tpu.parallel.mesh import data_sharding
        in_shd = data_sharding(mesh, 4)
    encode = jax.jit(
        lambda x: vae.apply(vae_params, x, method="encode_moments"),
        **({"in_shardings": (in_shd,)} if in_shd is not None else {}))
    loader = RangeLoader(dataset, batch_size=batch_size, shuffle=False,
                         drop_last=False)
    moments = None
    write_path = out_path + f".tmp-{os.getpid()}.npy" if out_path else None
    start = 0
    for batch in loader:
        imgs = np.asarray(batch["jpg"], np.float32)
        stop = start + len(imgs)
        pad = batch_size - len(imgs)
        if pad:      # keep one compiled shape for the ragged last batch
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        m = np.asarray(encode(jnp.asarray(imgs)), np.float32)[:stop - start]
        if moments is None:
            shape = (n,) + m.shape[1:]
            if write_path:
                moments = np.lib.format.open_memmap(
                    write_path, mode="w+", dtype=np.float32, shape=shape)
            else:
                moments = np.empty(shape, np.float32)
        moments[start:stop] = m
        if log and (start // batch_size) % 50 == 0:
            log(f"[latent-cache] encoded {stop}/{n}")
        start = stop
    if out_path:
        moments.flush()
        del moments
        os.replace(write_path, out_path)
        with open(out_path + ".json", "w") as f:
            json.dump({"n": n, "tag": tag, "data_tag": data_tag,
                       "shape": list(shape)}, f)
        return np.load(out_path, mmap_mode="r")
    return moments
