"""Data-loader steady-state throughput benchmark (VERDICT r3 weak #3).

The latent-cached LDM train step runs at ~60 ms/b32 on v5e, i.e. the input
pipeline must sustain ~536 images/s to keep the chip busy. The reference
hid input-pipeline stalls behind a 2 h NCCL timeout
(ldm/train_unconditional.py:127); we measure instead:

  1. cold path    — raw .bin -> projection (native C++ core) -> .npz cache
  2. cached path  — .npz decompress -> collate -> shard_batch (the path
                    that must sustain the train step, epoch 2+)
  3. moments path — MomentsDataset (the flagship cache_latents config)

    python tools/bench_loader.py [--scans 256] [--batch 32] [--width 1024]

Prints one JSON line per path with images/s, plus the sustain verdict
against a --target rate (default 536). Run on the training host — this
sandbox has 1 CPU core, so its absolute numbers are a lower bound; the
per-core scan rate is the portable figure (threads scale it on real hosts).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

# run from anywhere: the repo root is this file's parent dir (PYTHONPATH
# breaks the sandbox's TPU plugin, so extend sys.path in-process instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=256)
    ap.add_argument("--points", type=int, default=120_000,
                    help="points per synthetic scan (KITTI-360 ~120k)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--target", type=float, default=536.0,
                    help="images/s the train step consumes (60 ms/b32)")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--uncompressed", action="store_true",
                    help="bench the cache_compress: false fast-read path")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rangeldm_tpu.data.datasets import (
        DatasetConfig, RangeImageDataset, RangeLoader,
    )
    from rangeldm_tpu.parallel.mesh import make_mesh, shard_batch
    from rangeldm_tpu.training.latent_cache import MomentsDataset

    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        # synthetic KITTI-360 tree at full scan size
        import os
        d = os.path.join(root, "data_3d_raw", "2013_05_28_drive_0003_sync",
                         "velodyne_points", "data")
        os.makedirs(d)
        rng = np.random.default_rng(0)
        proto = _scan(rng, args.points)
        for i in range(args.scans):
            # rotate the prototype so caches differ but generation is cheap
            s = proto.copy()
            s[:, 3] = np.roll(s[:, 3], i)
            s.tofile(os.path.join(d, f"{i:010d}.bin"))

        cfg = DatasetConfig(root=root, sensor="kitti360", width=args.width,
                            cache_compress=not args.uncompressed)
        ds = RangeImageDataset(cfg, train=True)
        mesh = make_mesh()
        results = {}

        def drain(tag, loader, n_images):
            t0 = time.perf_counter()
            seen = 0
            for batch in loader:
                b = shard_batch(mesh, batch)
                # touch one element: completion barrier for the device put
                np.asarray(jax.tree_util.tree_leaves(b)[0][:1, :1])
                seen += len(next(iter(batch.values())))
                if seen >= n_images:
                    break
            dt = time.perf_counter() - t0
            rate = seen / dt
            results[tag] = {"images_per_s": round(rate, 1),
                            "images": seen, "seconds": round(dt, 2),
                            "sustains_target": bool(rate >= args.target)}
            print(f"[loader] {tag}: {rate:.1f} images/s "
                  f"({seen} in {dt:.1f}s)", flush=True)

        loader = RangeLoader(ds, batch_size=args.batch,
                             num_threads=args.threads, seed=0)
        drain("cold_projection", loader, args.scans)
        # epoch 2+: every item now hits the .npz cache
        drain("cached_npz", loader, args.scans)

        lh, lw = 16, args.width // 4
        moments = rng.standard_normal(
            (args.scans, lh, lw, 8)).astype(np.float32)
        mloader = RangeLoader(MomentsDataset(moments), batch_size=args.batch,
                              num_threads=args.threads, seed=0)
        drain("moments_cache", mloader, args.scans)

        print(json.dumps({"metric": "loader_throughput",
                          "target_images_per_s": args.target,
                          "paths": results}))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


def _scan(rng, n):
    import numpy as np
    azi = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2.5, 80.0, n)
    zen = rng.uniform(-0.43, 0.03, n)
    x = r * np.cos(zen) * np.cos(azi)
    y = r * np.cos(zen) * np.sin(azi)
    z = r * np.sin(zen)
    inten = rng.uniform(0, 1, n)
    return np.stack([x, y, z, inten], 1).astype(np.float32)


if __name__ == "__main__":
    main()
