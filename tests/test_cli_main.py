"""The documented CLI commands actually run end-to-end.

Round-1 shipped both `main()`s with a misplaced-paren TypeError that the
class-level tests never hit. These tests write a tiny synthetic KITTI-360
`.bin` tree + a YAML config to tmp, monkeypatch argv, and execute
`python -m rangeldm_tpu.train_{ldm,vae} --cfg ... --max_steps 2` in-process
(the equivalents of ldm/train_unconditional.py:123 / vae/main.py:498).
"""

import os
import sys

import numpy as np
import pytest
import yaml

from conftest import synthetic_scan
from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig

TINY_CLI = zoo.ModelSpec(
    name="tiny_cli",
    unet=UNetConfig(sample_size=(32, 32), in_channels=5, out_channels=4,
                    block_out_channels=(32, 32),
                    down_block_types=("DownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "UpBlock2D")),
    vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
    image_size=(64, 64),
)
zoo.ZOO["tiny_cli"] = lambda: TINY_CLI


@pytest.fixture
def kitti_tree(tmp_path, rng):
    """8 train scans (drive 0003) + 4 held-out scans (drive 0000) in the KITTI-360 raw layout."""
    d = tmp_path / "kitti" / "data_3d_raw" / "2013_05_28_drive_0003_sync" \
        / "velodyne_points" / "data"
    d.mkdir(parents=True)
    for i in range(8):
        synthetic_scan(rng, n=4000).astype(np.float32).tofile(
            str(d / f"{i:010d}.bin"))
    # held-out drive 0000 (val split; kitti360_range_image.py:76-80)
    v = tmp_path / "kitti" / "data_3d_raw" / "2013_05_28_drive_0000_sync" \
        / "velodyne_points" / "data"
    v.mkdir(parents=True)
    for i in range(4):
        synthetic_scan(rng, n=4000).astype(np.float32).tofile(
            str(v / f"{i:010d}.bin"))
    return str(tmp_path / "kitti")


def run_main(monkeypatch, module, cfg_path, max_steps=2):
    monkeypatch.setattr(sys, "argv", [module.__name__, "--cfg", cfg_path,
                                      "--max_steps", str(max_steps)])
    module.main()


@pytest.mark.heavy
def test_train_ldm_main(monkeypatch, tmp_path, kitti_tree):
    import rangeldm_tpu.train_ldm as mod
    out = str(tmp_path / "ldm_run")
    cfg = {
        "model": "tiny_cli", "output_dir": out,
        "train_batch_size": 8, "use_ema": True, "with_vae": True,
        "checkpointing_steps": 2, "num_epochs": 1,
        "data": {"root": kitti_tree, "sensor": "kitti360", "width": 64,
                 "used_feature": 2},
    }
    cfg_path = str(tmp_path / "ldm.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_main(monkeypatch, mod, cfg_path)
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
    assert os.path.exists(os.path.join(out, "pipeline", "model_index.json"))


@pytest.mark.heavy
def test_train_vae_main(monkeypatch, tmp_path, kitti_tree):
    import rangeldm_tpu.train_vae as mod
    out = str(tmp_path / "vae_run")
    cfg = {
        "output_dir": out, "batch_size": 8, "image_size": [64, 64],
        "vae": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4},
        "loss": {"disc_start": 100, "metakernel": True},
        "checkpoint_every_steps": 2, "max_epochs": 1,
        "data": {"root": kitti_tree, "sensor": "kitti360", "width": 64,
                 "used_feature": 2},
    }
    cfg_path = str(tmp_path / "vae.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_main(monkeypatch, mod, cfg_path)
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
    assert os.path.exists(os.path.join(out, "vae_sgm.safetensors"))
    # post-fit test pass over the held-out drives (vae/main.py:905-906)
    import json
    with open(os.path.join(out, "val_metrics.json")) as f:
        val = json.load(f)
    assert np.isfinite(val["val/rec_loss"])
    assert np.isfinite(val["val/rec_loss_ema"])


def test_vae_trainer_loss_branch_plumbing(tmp_path):
    """cfg keys -> VaeLossConfig fields + voxel/perceptual fns (construction
    only; the branch math is exercised in tests/test_lpips.py)."""
    from rangeldm_tpu.train_vae import VaeTrainer
    from rangeldm_tpu.utils.config import Cfg
    cfg = Cfg.wrap({
        "output_dir": str(tmp_path / "v"), "batch_size": 8,
        "image_size": [32, 64],
        "vae": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4},
        "loss": {"disc_start": 10, "metakernel": False,
                 "encoding": "log", "use_rec_loss_true": True,
                 "bev_rec_weight": 0.25, "perceptual_weight": 0.1,
                 "bev_perceptual": True},
    })
    tr = VaeTrainer(cfg)
    lc = tr.loss_cfg
    assert lc.encoding == "log" and lc.use_rec_loss_true
    assert lc.bev_rec_weight == 0.25 and lc.perceptual_weight == 0.1
    assert lc.bev_perceptual


def test_vae_trainer_invalid_perceptual_pairings(tmp_path):
    """The branch/net pairing mirrors the reference dispatch
    (losses/__init__.py:257-292); invalid combinations fail fast instead of
    crashing at trace time (vgg on NHWC range images) or silently training
    against garbage geometry (MetaKernel on BEV grids)."""
    from rangeldm_tpu.train_vae import VaeTrainer
    from rangeldm_tpu.utils.config import Cfg

    base = {"output_dir": str(tmp_path / "v"), "batch_size": 8,
            "image_size": [32, 64],
            "vae": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4}}

    with pytest.raises(ValueError, match="bev_perceptual"):
        VaeTrainer(Cfg.wrap({**base, "loss": {
            "metakernel": False, "perceptual_weight": 0.1,
            "perceptual_kind": "vgg", "bev_perceptual": False}}))
    with pytest.raises(ValueError, match="darknet"):
        VaeTrainer(Cfg.wrap({**base, "loss": {
            "metakernel": False, "perceptual_weight": 0.1,
            "perceptual_kind": "darknet", "bev_perceptual": True}}))
    with pytest.raises(ValueError, match="metakernel"):
        VaeTrainer(Cfg.wrap({**base, "loss": {"disc_bev": True}}))
    # defaulted kind follows the branch: bev -> vgg, range image -> darknet
    tr = VaeTrainer(Cfg.wrap({**base, "loss": {
        "metakernel": False, "perceptual_weight": 0.1,
        "bev_perceptual": False}}))
    assert tr.loss_cfg.perceptual_weight == 0.1


@pytest.mark.heavy
def test_train_ldm_main_cache_latents(monkeypatch, tmp_path, kitti_tree):
    """cache_latents: one encode pass writes latent_moments.npy, training
    consumes cached moments (36%-of-step encoder saving, BENCHMARKS.md)."""
    import rangeldm_tpu.train_ldm as mod
    out = str(tmp_path / "ldm_cached")
    cfg = {
        "model": "tiny_cli", "output_dir": out,
        "train_batch_size": 8, "use_ema": True, "with_vae": True,
        "cache_latents": True, "checkpointing_steps": 2, "num_epochs": 1,
        "data": {"root": kitti_tree, "sensor": "kitti360", "width": 64,
                 "used_feature": 2},
    }
    cfg_path = str(tmp_path / "ldm_cached.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_main(monkeypatch, mod, cfg_path)
    assert os.path.exists(os.path.join(out, "latent_moments.npy"))
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
