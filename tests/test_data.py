"""Dataset/loader tests over a synthetic on-disk KITTI-360 tree."""

import time

import numpy as np
import pytest

from rangeldm_tpu.data.datasets import DatasetConfig, RangeImageDataset, RangeLoader, collate
from conftest import synthetic_scan


@pytest.fixture
def kitti_tree(tmp_path, rng):
    root = tmp_path / "kitti"
    for drive in ["0000_sync", "0002_sync", "0003_sync", "0004_sync"]:
        d = root / "data_3d_raw" / f"2013_05_28_drive_{drive}" / \
            "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(3):
            synthetic_scan(rng, n=8000).tofile(d / f"{i:010d}.bin")
    return str(root)


def test_split_and_shapes(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree)
    train = RangeImageDataset(cfg, train=True)
    test = RangeImageDataset(cfg, train=False)
    assert len(train) == 6 and len(test) == 6   # 2 drives each, 3 scans
    s = train[0]
    assert s["jpg"].shape == (64, 1024, 2)
    assert s["mask"].shape == (64, 1024)
    assert s["jpg"].dtype == np.float32


def test_caching_round_trip(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree)
    ds = RangeImageDataset(cfg, train=True)
    a = ds[1]["jpg"]
    import os
    cache = ds._cache_path(ds.files[1])
    assert os.path.exists(cache)
    b = ds[1]["jpg"]      # from cache
    np.testing.assert_array_equal(a, b)
    # prove the second read actually CAME from the cache (re-projection is
    # deterministic, so equality alone cannot): plant a sentinel
    with np.load(cache) as z:
        mask, cw = z["mask"], z["car_window_mask"]
    sentinel = np.full_like(a, 7.25)
    np.savez_compressed(cache, jpg=sentinel, mask=mask, car_window_mask=cw)
    c = ds[1]["jpg"]
    np.testing.assert_array_equal(c, sentinel[..., :c.shape[-1]])


def test_cache_uncompressed_option(kitti_tree):
    """cache_compress: false writes plain .npz (the ~7x-faster-read loader
    path, tools/bench_loader.py) with identical content and the same cache
    filename — both formats load transparently."""
    import os
    import zipfile
    comp = RangeImageDataset(DatasetConfig(root=kitti_tree), train=True)
    a = comp[2]["jpg"]
    cache = comp._cache_path(comp.files[2])
    os.remove(cache)
    fast = RangeImageDataset(DatasetConfig(root=kitti_tree,
                                           cache_compress=False), train=True)
    b = fast[2]["jpg"]
    np.testing.assert_array_equal(a, b)
    assert fast._cache_path(fast.files[2]) == cache    # same identity
    with zipfile.ZipFile(cache) as z:
        assert all(i.compress_type == zipfile.ZIP_STORED
                   for i in z.infolist())
    # and the compressed reader still consumes it
    c = comp[2]["jpg"]
    np.testing.assert_array_equal(a, c)


def test_cache_compress_false_heals_existing_compressed_cache(kitti_tree):
    """Flipping cache_compress: false on a root that ALREADY has
    compressed caches must not be a silent no-op (the cache-hit path
    never re-keys): the first read rewrites the entry STORED in place, so
    the fast-read rate materializes without a manual cache wipe."""
    import os
    import zipfile
    comp = RangeImageDataset(DatasetConfig(root=kitti_tree), train=True)
    a = comp[1]["jpg"]
    cache = comp._cache_path(comp.files[1])
    with zipfile.ZipFile(cache) as z:
        assert any(i.compress_type != zipfile.ZIP_STORED
                   for i in z.infolist())
    fast = RangeImageDataset(DatasetConfig(root=kitti_tree,
                                           cache_compress=False), train=True)
    np.testing.assert_array_equal(fast[1]["jpg"], a)   # heal-on-read
    with zipfile.ZipFile(cache) as z:
        assert all(i.compress_type == zipfile.ZIP_STORED
                   for i in z.infolist())
    np.testing.assert_array_equal(fast[1]["jpg"], a)   # post-heal read


def test_cache_keyed_by_projection_spec(kitti_tree):
    """Different projection settings over the same root must use different
    cache files (round-3 review: the reference keys its .pth caches by
    directory only, so a sensor/encoding/normalization change silently
    reused images projected under the OLD settings)."""
    base = RangeImageDataset(DatasetConfig(root=kitti_tree), train=True)
    logd = RangeImageDataset(DatasetConfig(root=kitti_tree, log=True),
                             train=True)
    norm = RangeImageDataset(DatasetConfig(root=kitti_tree, mean=50.0,
                                           std=50.0), train=True)
    import os
    paths = {d._cache_path(d.files[0]) for d in (base, logd, norm)}
    assert len(paths) == 3
    # default settings keep the bare reference-style name (stem = scan id)
    stem = os.path.basename(base._cache_path(base.files[0]))[:-len(".npz")]
    assert stem.isdigit()
    # content actually differs when loaded through the differing configs
    a = base[0]["jpg"]
    b = logd[0]["jpg"]
    assert not np.allclose(a, b)


def test_downsample_condition(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree, downsample=4)
    ds = RangeImageDataset(cfg, train=True)
    s = ds[0]
    # beam stride 4 starting at beam 2 (ldm/dataset.py:344-346)
    assert s["down"].shape == (16, 1024, 2)
    np.testing.assert_array_equal(s["down"], s["jpg"][2::4, :, :])


def test_inpainting_condition(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree, inpainting=0.0625)
    ds = RangeImageDataset(cfg, train=True)
    s = ds[0]
    m = s["inpainting_mask"]
    assert m.shape == (64, 1024, 1)
    w_masked = int(0.0625 * 1024)
    assert (m[:, :w_masked, 0] == 1).all()
    assert (m[:, w_masked:, 0] == -1).all()
    # masked image carries original pixels outside the mask, -1 inside
    np.testing.assert_array_equal(
        s["masked_image"][:, w_masked:, :], s["jpg"][:, w_masked:, :])
    assert (s["masked_image"][:, :w_masked, :] == -1).all()


def test_loader_batching(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree)
    ds = RangeImageDataset(cfg, train=True)
    loader = RangeLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["jpg"].shape == (2, 64, 1024, 2)
    # reshuffles across epochs: _order seeds with seed + epoch counter
    first = list(loader._order())
    again = list(loader)
    assert len(again) == 3
    assert list(loader._order()) != first


def test_coord_channel(kitti_tree):
    cfg = DatasetConfig(root=kitti_tree, coord=True, cache=False)
    ds = RangeImageDataset(cfg, train=True)
    s = ds[0]
    assert s["jpg"].shape == (64, 1024, 3)
    np.testing.assert_allclose(s["jpg"][:, 0, 2], np.arange(64) / 64,
                               rtol=1e-6)


def test_stf_dataset(tmp_path, rng):
    from conftest import synthetic_scan
    root = tmp_path / "stf"
    (root / "ImageSets").mkdir(parents=True)
    (root / "lidar_hdl64_strongest").mkdir()
    names = []
    for i in range(3):
        pc = synthetic_scan(rng, n=4000, n_beams=64, with_ring=True)
        pc[:, 3] *= 255.0
        name = f"2019-01-01_00-00-0{i},00100"
        names.append(name)
        pc.tofile(root / "lidar_hdl64_strongest" /
                  (name.replace(",", "_") + ".bin"))
    (root / "ImageSets" / "train.txt").write_text("\n".join(names))
    (root / "ImageSets" / "val.txt").write_text(names[0])

    cfg = DatasetConfig(root=str(root), sensor="stf")
    ds = RangeImageDataset(cfg, train=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["jpg"].shape == (64, 1024, 2)
    assert np.isfinite(s["jpg"]).all()
    assert len(RangeImageDataset(cfg, train=False)) == 1


def test_loader_propagates_producer_errors(tmp_path):
    """A failing sample must raise in the consumer, not hang the training
    loop forever on q.get() (the producer used to die before its sentinel)."""
    from rangeldm_tpu.data.datasets import RangeLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise OSError(f"corrupt sample {i}")

    loader = RangeLoader(Broken(), batch_size=4, shuffle=False)
    with pytest.raises(RuntimeError, match="producer failed"):
        next(iter(loader))


def test_loader_early_break_releases_threads(tmp_path):
    """Breaking out of an epoch (sample CLIs) must shut the pool/producer
    down instead of leaking blocked threads per abandoned epoch."""
    import threading

    from rangeldm_tpu.data.datasets import RangeLoader

    class Tiny:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"jpg": np.zeros((4, 8, 2), np.float32)}

    before = threading.active_count()
    for _ in range(5):
        it = iter(RangeLoader(Tiny(), batch_size=4, shuffle=False,
                              prefetch=2))
        next(it)
        it.close()                       # generator finalization
    time.sleep(0.5)
    assert threading.active_count() <= before + 2


def test_multihost_shards_equal_length(monkeypatch):
    """Shards must agree on batch count across hosts (a surplus batch on one
    host deadlocks the collective)."""
    import jax

    from rangeldm_tpu.data.datasets import RangeLoader

    class Tiny:
        def __len__(self):
            return 77

        def __getitem__(self, i):
            return {"jpg": np.zeros((2, 2, 2), np.float32)}

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    lens, orders = [], []
    for pi in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        loader = RangeLoader(Tiny(), batch_size=4, shuffle=False,
                             shard_by_process=True)
        lens.append(len(loader))
        orders.append(list(loader._order()))
    assert len(set(lens)) == 1
    # the invariant len() promises: every host's actual shard is truncated
    # to the common minimum (77 = 4*19 + 1 -> 19 each, the surplus index
    # dropped), shards are disjoint, and len() matches the real batches
    assert all(len(o) == 77 // 4 for o in orders)
    flat = [i for o in orders for i in o]
    assert len(flat) == len(set(flat))
    assert lens[0] == (77 // 4) // 4


def test_loader_stall_warning(monkeypatch):
    """A producer that cannot sustain the consumer's demand must emit ONE
    structured LoaderStallWarning naming the measured img/s, the demanded
    rate, and the config remedies (the runtime version of
    tools/bench_loader.py's verdict — vs the reference's silent stall until
    the 2h timeout, ldm/train_unconditional.py:127)."""
    from rangeldm_tpu.data.datasets import LoaderStallWarning, RangeLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            time.sleep(0.02)   # 1 thread x 50 items/s << consumer demand
            return {"jpg": np.zeros((4, 8, 2), np.float32)}

    loader = RangeLoader(Slow(), batch_size=4, shuffle=False, prefetch=1,
                         num_threads=1)
    monkeypatch.setattr(RangeLoader, "STALL_STEPS", 3)
    monkeypatch.setattr(RangeLoader, "STALL_WAIT_S", 0.005)
    with pytest.warns(LoaderStallWarning) as rec:
        for _ in loader:       # consumer consumes instantly -> starves
            pass
    assert len(rec) == 1       # once per loader, not per starved batch
    msg = str(rec[0].message)
    assert "img/s" in msg and "cache_compress" in msg \
        and "cache_latents" in msg
    rep = loader.stall_report
    assert rep["starved_batches"] >= 3
    assert 0 < rep["measured_imgs_per_s"] < rep["demanded_imgs_per_s"]
    assert loader.wait_fraction > 0.5   # consumer mostly blocked

    # second epoch on the same (still-starved) loader: no duplicate warning
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error", LoaderStallWarning)
        for _ in loader:
            pass


def test_loader_no_stall_warning_when_keeping_up():
    """A producer faster than the consumer must never warn, and the wait
    fraction it reports to the trainers stays low."""
    from rangeldm_tpu.data.datasets import LoaderStallWarning, RangeLoader

    class Fast:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"jpg": np.zeros((4, 8, 2), np.float32)}

    loader = RangeLoader(Fast(), batch_size=4, shuffle=False, prefetch=2)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error", LoaderStallWarning)
        for _ in loader:
            time.sleep(0.005)  # consumer is the slow side
    assert loader.stall_report is None
