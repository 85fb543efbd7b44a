"""Datasets & loading (L1): KITTI-360 / nuScenes / vanilla readers with
projection caching, train/test splits, and condition generation.

Re-implements RangeDataset/RangeLoader (ldm/dataset.py:298-417) and the
dataset subclasses (ldm/kitti360_range_image.py:65-130,
ldm/nuscenes_range_image.py:48-121) with idiomatic-NHWC outputs:

  sample dict: jpg (H, W, C) float32, mask (H, W) bool, car_window_mask
  (H, W) bool [, down, inpainting_mask, masked_image]

Differences from the reference, by design:
  * cache files are .npz next to the raw scans (data_3d_range dirs), not
    torch .pth;
  * the projection runs through geometry.range_image_np (bit-faithful);
  * conditions (down/inpainting) are derived at load time from the cached
    projection, mirroring ldm/dataset.py:340-362.
"""

from __future__ import annotations

import dataclasses
import json
import os
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from rangeldm_tpu.geometry import SensorSpec, get_spec, range_image_np


@dataclasses.dataclass
class DatasetConfig:
    root: str
    sensor: str = "kitti360"
    width: int = 1024
    used_feature: int = 2
    downsample: Optional[Sequence[int]] = None   # [beam_stride? azi?] see below
    inpainting: Optional[float] = None           # masked azimuth fraction
    coord: bool = False
    cache: bool = True
    # compressed caches are ~25% smaller but ~7x slower to read (zlib is
    # the steady-state loader bottleneck — tools/bench_loader.py measures
    # 221 vs 1510 images/s/core); turn off for high-throughput training
    cache_compress: bool = True
    log: bool = False
    inverse: bool = False
    mean: Optional[float] = None
    std: Optional[float] = None


class RangeImageDataset:
    """Indexable dataset of projected range images."""

    def __init__(self, cfg: DatasetConfig, train: bool = True):
        self.cfg = cfg
        kw = {}
        if cfg.mean is not None:
            kw["mean"] = cfg.mean
        if cfg.std is not None:
            kw["std"] = cfg.std
        self.spec: SensorSpec = get_spec(
            cfg.sensor, width=cfg.width, log=cfg.log, inverse=cfg.inverse, **kw)
        self.train = train
        self.files = self._list_files()
        downsample = cfg.downsample
        if isinstance(downsample, int):
            # reference normalizes int -> [1, n] (ldm/dataset.py:341-342):
            # stride n on the beam axis only
            downsample = [1, downsample]
        self.downsample = downsample
        self.inpainting = cfg.inpainting

    # -- file discovery ---------------------------------------------------
    def _list_files(self) -> List[str]:
        cfg = self.cfg
        if cfg.sensor in ("kitti360", "kitti360_vanilla"):
            files = glob(os.path.join(
                cfg.root, "data_3d_raw/*/velodyne_points/data/*.bin"))
            held_out = ("0000_sync", "0002_sync")
            if self.train:
                files = [f for f in files
                         if not any(h in f for h in held_out)]
            else:
                files = [f for f in files if any(h in f for h in held_out)]
            return sorted(files)
        if cfg.sensor == "nuscenes":
            split = "v1.0-trainval" if self.train else "v1.0-test"
            with open(os.path.join(cfg.root, split, "sample_data.json")) as f:
                sample_data = json.load(f)
            files = [os.path.join(cfg.root, x["filename"]) for x in sample_data
                     if "sweeps/LIDAR_TOP" in x["filename"]]
            return sorted(files)
        if cfg.sensor == "stf":
            # ImageSets split lists -> lidar_hdl64_strongest/*.bin
            # (vae/sgm/data/STF_range_image.py:70-85)
            split = "train" if self.train else "val"
            split_file = os.path.join(cfg.root, "ImageSets", f"{split}.txt")
            with open(split_file) as f:
                names = [x.strip().replace(",", "_") for x in f if x.strip()]
            return [os.path.join(cfg.root, "lidar_hdl64_strongest", n + ".bin")
                    for n in names]
        raise ValueError(cfg.sensor)

    def _load_points(self, path: str) -> np.ndarray:
        if self.cfg.sensor in ("nuscenes", "stf"):
            pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
            pts[:, 3] /= 255.0       # ldm/nuscenes_range_image.py:78
            return pts
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    @property
    def _spec_tag(self) -> str:
        """Projection-identity fingerprint baked into the cache filename:
        the reference keys its .pth caches by directory only, so toggling
        sensor variant (kitti360 vs vanilla), width, encoding, or mean/std
        over the same root would silently reuse images projected under the
        OLD settings. Default kitti360 settings keep the bare name (cache
        compatibility); anything else gets a suffix."""
        c = self.cfg
        if (c.sensor == "kitti360" and c.width == 1024 and not c.log
                and not c.inverse and c.mean is None and c.std is None):
            return ""
        import hashlib
        blob = f"{c.sensor}:{c.width}:{c.log}:{c.inverse}:{c.mean}:{c.std}"
        return "." + hashlib.sha256(blob.encode()).hexdigest()[:10]

    def _cache_path(self, path: str) -> str:
        ext = self._spec_tag + ".npz"
        if self.cfg.sensor == "nuscenes":
            return path.replace("sweeps", "sweeps_range").replace(".bin", ext)
        if self.cfg.sensor == "stf":
            return path.replace("lidar_hdl64", "lidar_range_hdl64").replace(
                ".bin", ext)
        return path.replace("data_3d_raw", "data_3d_range").replace(
            ".bin", ext)

    @staticmethod
    def _cache_tmp(cache: str) -> str:
        """Writer-unique tmp path for the atomic cache publish. Must be
        unique per THREAD, not just per pid: RangeLoader's producer pool
        can have two threads on the same item (epoch-overlap after an
        early consumer break), and interleaved np.savez writes to one tmp
        would publish a corrupt zip."""
        import threading
        return cache + f".tmp-{os.getpid()}-{threading.get_ident()}.npz"

    # -- sample assembly --------------------------------------------------
    def __len__(self) -> int:
        return len(self.files)

    def _base_sample(self, path: str) -> Dict[str, np.ndarray]:
        cache = self._cache_path(path)
        if self.cfg.cache and os.path.exists(cache):
            with np.load(cache) as z:
                img, mask, cw = z["jpg"], z["mask"], z["car_window_mask"]
                # self-healing: cache_compress=False on a root whose caches
                # were written compressed would otherwise be a silent no-op
                # (the hit path never re-keys) — rewrite STORED once so the
                # fast-read rate actually materializes from the next epoch.
                # Best-effort: a read-only cache root just reads slower.
                if (not self.cfg.cache_compress
                        and z.zip.infolist()[0].compress_type != 0):
                    try:
                        tmp = self._cache_tmp(cache)
                        np.savez(tmp, jpg=img, mask=mask, car_window_mask=cw)
                        os.replace(tmp, cache)
                    except OSError:
                        pass
        else:
            pts = self._load_points(path)
            from rangeldm_tpu import native
            if native.available():
                img, mask, cw = native.range_image_native(pts, self.spec)
            else:
                img, mask, cw = range_image_np(pts, self.spec)
            if self.cfg.cache:
                Path(cache).parent.mkdir(parents=True, exist_ok=True)
                # atomic write: a preempted/concurrent run must never leave
                # a truncated zip at the cache path (it would poison every
                # later epoch with BadZipFile)
                tmp = self._cache_tmp(cache)
                save = np.savez_compressed if self.cfg.cache_compress \
                    else np.savez
                save(tmp, jpg=img, mask=mask, car_window_mask=cw)
                os.replace(tmp, cache)
        img = img[..., :self.cfg.used_feature]
        if self.cfg.coord:
            h = img.shape[0]
            coord = np.broadcast_to(
                (np.arange(h, dtype=np.float32) / h)[:, None, None],
                (h, img.shape[1], 1))
            img = np.concatenate([img, coord], axis=-1)
        return {"jpg": img.astype(np.float32), "mask": mask,
                "car_window_mask": cw}

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ret = self._base_sample(self.files[idx])
        img = ret["jpg"]
        if self.downsample:
            sb, sa = self.downsample[1], self.downsample[0]
            # reference subsamples (C, W_azi, H_beam) with strides
            # (down[0] on azi, down[1] on beams) starting at stride//2
            # (ldm/dataset.py:344-346)
            ret["down"] = img[(sb // 2)::sb, (sa // 2)::sa, :]
        if self.inpainting:
            h, w, c = img.shape
            # mask a leading azimuth sector of fraction `inpainting`
            # (ldm/dataset.py:347-362; start fixed at 0)
            m = -np.ones((h, w, 1), np.float32)
            end = int(self.inpainting * w)
            m[:, :end, :] = 1.0
            masked = -np.ones_like(img)
            keep = m[..., 0] < 0
            masked[keep] = img[keep]
            ret["inpainting_mask"] = m
            ret["masked_image"] = masked
        return ret


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts (ldm/dataset.py:370-380)."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class LoaderStallWarning(UserWarning):
    """The RangeLoader's producer cannot sustain the consumer's demand —
    the runtime version of tools/bench_loader.py's verdict. The reference
    has no such signal: a starved torch DataLoader silently stalls until
    the 2h NCCL timeout (ldm/train_unconditional.py:127)."""


class RangeLoader:
    """Minimal epoch iterator with shuffling and a background prefetch
    thread — the torch-DataLoader replacement feeding the TPU host
    pipeline.

    Self-instrumenting: tracks how long the consumer blocks on an empty
    queue and, once it has starved for STALL_STEPS consecutive batches,
    emits ONE LoaderStallWarning naming the measured production rate, the
    demanded rate, and the config remedies. ``wait_fraction`` (live,
    fraction of wall-clock the consumer spent waiting this epoch) feeds
    the trainers' step metrics as ``data_wait_frac``."""

    STALL_STEPS = 10      # consecutive starved gets before the warning
    STALL_WAIT_S = 0.01   # a get blocking longer than this is "starved"

    def __init__(self, dataset: RangeImageDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, num_threads: int = 8,
                 shard_by_process: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.shard_by_process = shard_by_process
        self._epoch = 0
        self._warned_stall = False
        self.wait_fraction = 0.0          # updated live during iteration
        self.stall_report: Optional[dict] = None

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        if self.shard_by_process:
            # multi-host: each process reads a disjoint slice of the epoch
            # (same seed everywhere so the global permutation agrees). Every
            # shard is truncated to the common minimum length — otherwise
            # hosts disagree on the number of batches and the surplus host
            # enters a train-step collective nobody else joins (deadlock).
            import jax
            n_common = len(order) // jax.process_count()
            order = order[jax.process_index()::jax.process_count()][:n_common]
        return order

    def __len__(self):
        if self.shard_by_process:
            import jax
            n = len(self.dataset) // jax.process_count()
        else:
            n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _warn_stall(self, starved: int, measured: float, demanded: float,
                    wait_frac: float):
        self._warned_stall = True
        self.stall_report = {
            "measured_imgs_per_s": measured, "demanded_imgs_per_s": demanded,
            "starved_batches": starved, "wait_fraction": wait_frac,
            "num_threads": self.num_threads,
        }
        import warnings
        warnings.warn(LoaderStallWarning(
            f"data producer cannot keep up: measured {measured:.0f} img/s "
            f"vs the {demanded:.0f} img/s the training step demands "
            f"(consumer blocked on an empty queue for {starved} consecutive "
            f"batches; wait fraction {wait_frac:.0%}). Remedies: set "
            f"data.cache_compress: false (zlib decode is the usual "
            f"bottleneck — tools/bench_loader.py measures ~7x faster "
            f"reads), cache_latents: true for unconditional frozen-VAE "
            f"training, or raise num_threads (currently "
            f"{self.num_threads})."), stacklevel=3)

    def __iter__(self):
        import queue
        import threading
        import time
        from concurrent.futures import ThreadPoolExecutor

        order = self._order()
        self._epoch += 1
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(self.num_threads)
        stop = threading.Event()
        end = object()
        # producer-side intrinsic rate: images per second of fetch+collate
        # time only (put-blocking excluded, so a fast producer waiting on a
        # slow consumer is not misreported as slow)
        prod = {"imgs": 0, "busy_s": 0.0}

        def put(item) -> bool:
            """Bounded put that gives up once the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # Exceptions are forwarded to the consumer — a dead producer
            # that never enqueues its sentinel would otherwise hang the
            # training loop on q.get() forever.
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    t0 = time.perf_counter()
                    samples = list(pool.map(self.dataset.__getitem__, idx))
                    batch = collate(samples)
                    prod["busy_s"] += time.perf_counter() - t0
                    prod["imgs"] += len(idx)
                    if not put(batch):
                        return
                put(end)
            except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        t_epoch = time.perf_counter()
        wait_s = 0.0
        consumed = 0
        starved = 0
        try:
            while True:
                t0 = time.perf_counter()
                item = q.get()
                now = time.perf_counter()
                got_wait = now - t0
                wait_s += got_wait
                if item is end:
                    break
                if isinstance(item, BaseException):
                    raise RuntimeError("RangeLoader producer failed") from item
                consumed += self.batch_size
                elapsed = max(now - t_epoch, 1e-9)
                self.wait_fraction = wait_s / elapsed
                if got_wait > self.STALL_WAIT_S:
                    starved += 1
                    if starved >= self.STALL_STEPS and not self._warned_stall:
                        measured = prod["imgs"] / max(prod["busy_s"], 1e-9)
                        demanded = consumed / max(elapsed - wait_s, 1e-9)
                        self._warn_stall(starved, measured, demanded,
                                         self.wait_fraction)
                else:
                    starved = 0
                yield item
        finally:
            # consumers may break mid-epoch (sample CLIs, eval loops):
            # release the producer (it may be blocked on a full queue) and
            # the pool instead of leaking a thread set per abandoned epoch
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            pool.shutdown(wait=False, cancel_futures=True)
