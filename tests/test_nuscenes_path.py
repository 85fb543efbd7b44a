"""The nuScenes data path, executed (VERDICT r3 missing #4).

Builds a synthetic nuScenes tree (v1.0-{trainval,test}/sample_data.json +
sweeps/LIDAR_TOP/*.bin with the 5-float x,y,z,intensity,ring layout) and
drives it through RangeImageDataset — asserting the reader semantics of
ldm/nuscenes_range_image.py:59-99 (LIDAR_TOP sweep filtering, ring-channel
rows, /255 intensity, 2 m filter, sweeps->sweeps_range caching) — and then
drives the SHIPPED configs/{rangeldm,vae}_nuscenes.yaml through the trainer
CLIs at tiny width via the left-to-right --cfg merge.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from conftest import synthetic_scan
from rangeldm_tpu.data.datasets import DatasetConfig, RangeImageDataset
from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig

W = 64


def _nus_scan(rng, n=4000):
    """5-float nuScenes sweep: raw intensity 0..255, ring 0..31."""
    pts = synthetic_scan(rng, n=n, n_beams=32, with_ring=True)
    pts[:, 3] *= 255.0
    return pts.astype(np.float32)


def make_nuscenes_tree(root, rng):
    """Synthetic nuScenes root: sweeps/LIDAR_TOP .bins + per-split
    sample_data.json with distractor rows (shared with the parity-gate
    nuScenes leg)."""
    sweep_dir = root / "sweeps" / "LIDAR_TOP"
    sweep_dir.mkdir(parents=True)
    entries = []
    for split, count in (("v1.0-trainval", 10), ("v1.0-test", 8)):
        (root / split).mkdir()
        names = []
        for i in range(count):
            name = f"sweeps/LIDAR_TOP/{split[-4:]}_{i:04d}.bin"
            _nus_scan(rng).tofile(root / name)
            names.append(name)
        # distractor rows the reader must skip: keyframe samples/ and
        # camera sweeps (ldm/nuscenes_range_image.py:66-68 filters on
        # 'sweeps/LIDAR_TOP' substring)
        entries_split = [{"filename": n} for n in names]
        entries_split.append({"filename": "samples/LIDAR_TOP/key.bin"})
        entries_split.append({"filename": "sweeps/CAM_FRONT/img.jpg"})
        with open(root / split / "sample_data.json", "w") as f:
            json.dump(entries_split, f)
        entries.append(names)
    return str(root), entries


@pytest.fixture
def nuscenes_tree(tmp_path, rng):
    return make_nuscenes_tree(tmp_path / "nus", rng)


def test_nuscenes_reader_semantics(nuscenes_tree, rng, monkeypatch):
    from rangeldm_tpu import native
    from rangeldm_tpu.geometry import range_image_np

    root, (train_names, test_names) = nuscenes_tree
    cfg = DatasetConfig(root=root, sensor="nuscenes", width=W)
    ds = RangeImageDataset(cfg, train=True)
    # only LIDAR_TOP sweeps of the trainval json, sorted
    assert ds.files == sorted(os.path.join(root, n) for n in train_names)
    ds_test = RangeImageDataset(cfg, train=False)
    assert ds_test.files == sorted(os.path.join(root, n) for n in test_names)
    assert ds.spec.n_beams == 32 and ds.spec.row_mode == "ring"
    assert ds.spec.mean == 50.0 and ds.spec.std == 50.0

    # sample == bit-faithful numpy projection of the /255-scaled raw cloud
    # (pin the numpy path so the expectation isn't computed twice through
    # the same native code)
    monkeypatch.setattr(native, "available", lambda: False)
    sample = ds[0]
    raw = np.fromfile(ds.files[0], np.float32).reshape(-1, 5)
    expect = raw.copy()
    expect[:, 3] /= 255.0                 # ldm/nuscenes_range_image.py:78
    img, mask, cw = range_image_np(expect, ds.spec)
    np.testing.assert_array_equal(sample["jpg"], img[..., :2])
    np.testing.assert_array_equal(sample["mask"], mask)
    assert sample["jpg"].shape == (32, W, 2)

    # cache: written under sweeps_range with the spec-tag suffix, and a
    # second read survives deleting the raw bin
    caches = [f for f in os.listdir(os.path.join(root, "sweeps_range",
                                                 "LIDAR_TOP"))
              if f.endswith(".npz")]
    assert len(caches) == 1
    os.rename(ds.files[0], ds.files[0] + ".gone")
    try:
        again = ds[0]
        np.testing.assert_array_equal(again["jpg"], sample["jpg"])
    finally:
        os.rename(ds.files[0] + ".gone", ds.files[0])


def test_nuscenes_ring_filter_and_intensity(tmp_path, monkeypatch):
    """Direct semantic spot-checks, independent of the projection helper:
    a sub-2 m point vanishes (depth > 2.0 filter), a lone point lands on
    row 31 - ring, and its intensity channel reads raw/255."""
    from rangeldm_tpu import native
    monkeypatch.setattr(native, "available", lambda: False)

    root = tmp_path / "nus"
    d = root / "sweeps" / "LIDAR_TOP"
    d.mkdir(parents=True)

    def write(name, pts):
        np.asarray(pts, np.float32).tofile(d / name)

    # one real point (depth 10, azimuth 0, ring 7, intensity 128) plus one
    # below the 2 m filter
    write("a.bin", [[10.0, 0.0, 0.0, 128.0, 7.0],
                    [1.0, 0.0, 0.5, 200.0, 3.0]])
    # every point below 2 m -> nothing projects at all
    write("b.bin", [[1.5, 0.0, 0.0, 10.0, 1.0],
                    [0.0, 1.0, 0.2, 20.0, 2.0]])
    (root / "v1.0-trainval").mkdir()
    with open(root / "v1.0-trainval" / "sample_data.json", "w") as f:
        json.dump([{"filename": "sweeps/LIDAR_TOP/a.bin"},
                   {"filename": "sweeps/LIDAR_TOP/b.bin"}], f)

    ds = RangeImageDataset(DatasetConfig(root=str(root), sensor="nuscenes",
                                         width=W, cache=False), train=True)
    a = ds[0]
    rows = np.unique(np.nonzero(a["mask"])[0])
    assert list(rows) == [32 - 1 - 7], "ring 7 must land on row 31-7 only"
    r, c = np.nonzero(a["mask"])
    assert np.allclose(a["jpg"][r, c, 1], 128.0 / 255.0)
    b = ds[1]
    assert not b["mask"].any(), "sub-2 m points must be filtered out"


TINY_NUS = zoo.ModelSpec(
    name="tiny_nus",
    unet=UNetConfig(sample_size=(16, 32), in_channels=5, out_channels=4,
                    block_out_channels=(32, 32),
                    down_block_types=("DownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "UpBlock2D")),
    vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
    image_size=(32, W), sensor="nuscenes",
)
zoo.ZOO["tiny_nus"] = lambda: TINY_NUS


def _run_cli(monkeypatch, module, cfg_paths, max_steps=2):
    monkeypatch.setattr(sys, "argv", [module.__name__, "--cfg", *cfg_paths,
                                      "--max_steps", str(max_steps)])
    module.main()


@pytest.mark.heavy
def test_train_ldm_nuscenes_config(monkeypatch, tmp_path, nuscenes_tree):
    """The SHIPPED configs/rangeldm_nuscenes.yaml drives the trainer CLI
    end-to-end (tiny-width override layered via the --cfg merge)."""
    import rangeldm_tpu.train_ldm as mod
    root, _ = nuscenes_tree
    monkeypatch.setenv("NUSCENES_DATASET", root)
    out = str(tmp_path / "nus_ldm")
    override = {
        "model": "tiny_nus", "output_dir": out, "train_batch_size": 8,
        "num_epochs": 1, "use_ema": False,
        "data": {"width": W},
    }
    opath = str(tmp_path / "tiny_override.yaml")
    with open(opath, "w") as f:
        yaml.safe_dump(override, f)
    shipped = os.path.join(os.path.dirname(mod.__file__),
                           "configs", "rangeldm_nuscenes.yaml")
    _run_cli(monkeypatch, mod, [shipped, opath])
    with open(os.path.join(out, "train_log.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert recs and np.isfinite(recs[-1]["loss"])
    assert os.path.exists(os.path.join(out, "pipeline", "model_index.json"))
    # the artifact records WHICH sensor geometry it was trained against
    # (no .get default — a dropped/mis-propagated sensor must fail here;
    # RangePipeline.from_pretrained back-projects with this record)
    with open(os.path.join(out, "pipeline", "model_index.json")) as f:
        meta = json.load(f)
    assert meta["sensor"] == "nuscenes"
    # ... and the normalization it trained with (nuScenes 50/50), so the
    # sampling CLI back-projects with the right affine
    assert meta["normalization"]["mean"] == 50.0
    assert meta["normalization"]["std"] == 50.0
    assert meta["normalization"]["log"] is False


@pytest.mark.heavy
def test_train_vae_nuscenes_config(monkeypatch, tmp_path, nuscenes_tree):
    """The SHIPPED configs/vae_nuscenes.yaml drives the VAE trainer CLI
    (tiny override on top); post-fit validation runs over v1.0-test."""
    import rangeldm_tpu.train_vae as mod
    root, _ = nuscenes_tree
    monkeypatch.setenv("NUSCENES_DATASET", root)
    out = str(tmp_path / "nus_vae")
    override = {
        "output_dir": out, "batch_size": 8, "image_size": [32, W],
        "max_epochs": 1, "vae": {"ch": 32, "ch_mult": [1, 2]},
        "loss": {"disc_start": 100},
        "data": {"width": W},
    }
    opath = str(tmp_path / "tiny_vae_override.yaml")
    with open(opath, "w") as f:
        yaml.safe_dump(override, f)
    shipped = os.path.join(os.path.dirname(mod.__file__),
                           "configs", "vae_nuscenes.yaml")
    _run_cli(monkeypatch, mod, [shipped, opath])
    with open(os.path.join(out, "train_log.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert recs and np.isfinite(recs[-1]["total_loss"])
    assert os.path.exists(os.path.join(out, "vae_sgm.safetensors"))
    with open(os.path.join(out, "val_metrics.json")) as f:
        val = json.load(f)
    assert np.isfinite(val["val/rec_loss"])
