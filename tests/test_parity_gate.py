"""The one-command released-weight parity gate runs end-to-end on synthetic
weights + a synthetic KITTI tree (VERDICT r3 missing #3): the real run is
then pure data. Covers the FAIL branch (random weights vs published
targets), the PASS branch (loosened targets over --skip_sampling re-gate),
the per-stage numeric report, and target auto-detection."""

import json
import os

import numpy as np
import pytest

from conftest import synthetic_scan
from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig
from rangeldm_tpu.utils.config import Cfg

TINY_GATE = zoo.ModelSpec(
    name="tiny_gate",
    unet=UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                    block_out_channels=(32, 32),
                    down_block_types=("DownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "UpBlock2D")),
    vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
    image_size=(8, 64),
)
zoo.ZOO["tiny_gate"] = lambda: TINY_GATE


@pytest.fixture
def kitti_heldout(tmp_path, rng):
    root = tmp_path / "kitti"
    for drive in ("0000_sync", "0002_sync"):
        d = root / "data_3d_raw" / f"2013_05_28_drive_{drive}" / \
            "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(3):
            synthetic_scan(rng, n=6000).tofile(d / f"{i:010d}.bin")
    return str(root)


@pytest.mark.heavy
def test_parity_gate_end_to_end(tmp_path, rng, kitti_heldout):
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu import parity_gate

    cfg = Cfg.wrap({"model": "tiny_gate",
                    "output_dir": str(tmp_path / "run"),
                    "train_batch_size": 8, "use_ema": False,
                    "with_vae": True})
    tr = LdmTrainer(cfg)

    def batches(n):
        for _ in range(n):
            yield {"jpg": rng.standard_normal((8, 8, 64, 2)).astype(
                np.float32)}

    tr.fit(batches(2), max_steps=2, log_every=1)
    weights = tr.save_final()
    out = str(tmp_path / "gate_out")

    # FAIL branch: a 2-step-trained toy cannot meet the published README
    # numbers — the gate must say so with finite scores, exit code 1
    code = parity_gate.main([
        "--weights", weights, "--data", kitti_heldout, "--out", out,
        "--samples", "4", "--batch_size", "4", "--steps", "2", "--fp32"])
    assert code == 1
    with open(os.path.join(out, "parity_report.json")) as f:
        report = json.load(f)
    assert report["pass"] is False
    assert report["target"] == "rangeldm_kitti360"  # auto-detected: has VAE
    assert report["image_size"] == [8, 64]
    # per-stage numeric report is present and sane
    assert report["unet_stage"]["finite"]
    assert np.isfinite(report["vae_stage"]["recon_mae_m"])
    assert np.isfinite(report["vae_stage"]["latent_std"])
    assert report["vae_stage"]["n_scans"] == 4
    # scores computed against the published bounds
    for k in ("mmd", "jsd"):
        assert np.isfinite(report["scores"][k])
        assert report["checks"][k]["published"] == \
            parity_gate.PUBLISHED["rangeldm_kitti360"][k]
        assert report["checks"][k]["bound"] == pytest.approx(
            report["checks"][k]["published"] * 1.05)
    assert report["n_sampled"] == 4
    assert len([f for f in os.listdir(out) if f.endswith(".bin")]) == 4

    # PASS branch: loosened targets re-gate the existing samples without
    # regenerating (--skip_sampling)
    code = parity_gate.main([
        "--weights", weights, "--data", kitti_heldout, "--out", out,
        "--samples", "4", "--skip_sampling", "--fp32",
        "--mmd_target", "1e6", "--jsd_target", "1e6"])
    assert code == 0
    with open(os.path.join(out, "parity_report.json")) as f:
        report2 = json.load(f)
    assert report2["pass"] is True
    assert report2["checks"]["mmd"]["ok"] and report2["checks"]["jsd"]["ok"]
    # deterministic scoring: same samples -> same scores (both metrics —
    # an unordered glob feeding the histograms would break either)
    assert report2["scores"]["mmd"] == report["scores"]["mmd"]
    assert report2["scores"]["jsd"] == report["scores"]["jsd"]


def test_detect_target_shapes():
    from rangeldm_tpu import parity_gate

    def fake(h_img, with_vae, down=4):
        vcfg = VaeConfig(ch=32, ch_mult=(1, 2, 4) if down == 4 else (1, 2),
                         z_channels=4) if with_vae else None
        f = vcfg.down_factor if vcfg else 1
        ucfg = UNetConfig(sample_size=(h_img // f, 1024 // f),
                          in_channels=5, out_channels=4,
                          block_out_channels=(32, 32),
                          down_block_types=("DownBlock2D", "DownBlock2D"),
                          up_block_types=("UpBlock2D", "UpBlock2D"))
        return {"meta": {}, "unet_cfg": ucfg, "vae_cfg": vcfg,
                "vae": object() if with_vae else None}

    assert parity_gate.detect_target(fake(64, True)) == "rangeldm_kitti360"
    assert parity_gate.detect_target(fake(64, False)) == "rangedm_kitti360"
    assert parity_gate.detect_target(fake(32, True)) == "rangeldm_nuscenes"
    # family beats beam count: a (hypothetical) 32-beam pixel model must
    # gate against the pixel row, not the latent nuScenes row
    assert parity_gate.detect_target(fake(32, False)) == "rangedm_kitti360"
    assert parity_gate.pipe_image_size(fake(64, True)) == (64, 1024)
    assert parity_gate.pipe_image_size(fake(64, False)) == (64, 1024)


@pytest.mark.heavy
def test_parity_gate_hf_layout_and_frd_leg(tmp_path, rng, kitti_heldout):
    """Release-day chain on the real checkpoint FORMAT (VERDICT r4 next #1):
    the published checkpoints are HF-diffusers pipeline dirs
    (ldm/train_unconditional.py:654-682), so the gate's first step must be
    CI-driven through that layout — auto-routing in load_any_pipeline,
    vae_stage_report through the diffusers-VAE conversion, meta-less
    normalization, sampling, scoring, exit codes — plus the
    --rangenet/--gate_frd leg on the same samples."""
    from test_released_pipeline import build_fake_release
    from rangeldm_tpu import parity_gate

    # attention-free tiny config: CPU-compilable (verify-skill caveat);
    # image = unet (4, 32) x vae down 2 = (8, 64)
    ucfg = UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                      block_out_channels=(32, 32),
                      down_block_types=("DownBlock2D", "DownBlock2D"),
                      up_block_types=("UpBlock2D", "UpBlock2D"))
    weights = build_fake_release(tmp_path, rng, ucfg=ucfg)
    out = str(tmp_path / "gate_hf")

    # FAIL branch: random released-format weights cannot meet the README
    # numbers; the gate must load the HF dir, run every stage, and exit 1
    code = parity_gate.main([
        "--weights", weights, "--data", kitti_heldout, "--out", out,
        "--samples", "4", "--batch_size", "4", "--steps", "2", "--fp32"])
    assert code == 1
    with open(os.path.join(out, "parity_report.json")) as f:
        report = json.load(f)
    assert report["pass"] is False
    assert report["pipeline"]["source"] == "diffusers"   # HF path taken
    assert report["target"] == "rangeldm_kitti360"       # has VAE, h != 32
    assert report["image_size"] == [8, 64]
    # vae stage went through load_diffusers_vae + meta-less normalization
    assert np.isfinite(report["vae_stage"]["recon_mae_m"])
    assert np.isfinite(report["vae_stage"]["latent_std"])
    assert report["vae_stage"]["n_scans"] == 4
    assert report["unet_stage"]["finite"]
    assert report["n_sampled"] == 4
    assert len([f for f in os.listdir(out) if f.endswith(".bin")]) == 4
    for k in ("mmd", "jsd"):
        assert np.isfinite(report["scores"][k])

    # FRD leg: --rangenet computes the FRD row; --gate_frd makes it gate.
    # Loosened MMD/JSD + an impossible FRD target isolates the FRD check:
    # exit 1 must come from FRD alone.
    from test_evaluate_cli import _make_rangenet_ckpt
    ckpt = _make_rangenet_ckpt(tmp_path)
    code = parity_gate.main([
        "--weights", weights, "--data", kitti_heldout, "--out", out,
        "--samples", "4", "--skip_sampling", "--fp32",
        "--rangenet", ckpt, "--gate_frd",
        "--mmd_target", "1e6", "--jsd_target", "1e6",
        "--frd_target", "1e-9"])
    assert code == 1
    with open(os.path.join(out, "parity_report.json")) as f:
        rep2 = json.load(f)
    assert np.isfinite(rep2["scores"]["frd"]) and rep2["scores"]["frd"] > 0
    assert rep2["checks"]["mmd"]["ok"] and rep2["checks"]["jsd"]["ok"]
    assert rep2["checks"]["frd"]["ok"] is False
    assert rep2["pass"] is False
    # same FRD score would pass under a loosened target (bound math, no
    # recompute): the published-x-(1+tol) contract
    assert rep2["scores"]["frd"] <= 1e9 * 1.05


@pytest.mark.heavy
def test_parity_gate_nuscenes_leg(tmp_path, rng):
    """nuScenes-target leg over a synthetic tree (VERDICT r4 next #1): a
    32-beam HF release auto-detects rangeldm_nuscenes, reads held-out
    sweeps via v1.0-test/sample_data.json, applies the /255 intensity
    convention in the VAE stage, and gates MMD/JSD only (the published
    nuScenes row has no FRD)."""
    from test_nuscenes_path import make_nuscenes_tree
    from test_released_pipeline import build_fake_release
    from rangeldm_tpu import parity_gate

    nus_root, _ = make_nuscenes_tree(tmp_path / "nus", rng)
    # image = unet (16, 32) x vae down 2 = (32, 64): 32 beams -> nuScenes
    ucfg = UNetConfig(sample_size=(16, 32), in_channels=5, out_channels=4,
                      block_out_channels=(32, 32),
                      down_block_types=("DownBlock2D", "DownBlock2D"),
                      up_block_types=("UpBlock2D", "UpBlock2D"))
    weights = build_fake_release(tmp_path, rng, ucfg=ucfg)
    out = str(tmp_path / "gate_nus")

    code = parity_gate.main([
        "--weights", weights, "--data", nus_root, "--out", out,
        "--samples", "4", "--batch_size", "4", "--steps", "2", "--fp32"])
    assert code == 1
    with open(os.path.join(out, "parity_report.json")) as f:
        report = json.load(f)
    assert report["target"] == "rangeldm_nuscenes"   # auto-detected: h == 32
    assert report["image_size"] == [32, 64]
    assert report["vae_stage"]["n_scans"] == 4       # 5-feat sweeps loaded
    assert sorted(report["checks"]) == ["jsd", "mmd"]  # no FRD row published
    for k in ("mmd", "jsd"):
        assert np.isfinite(report["scores"][k])
        assert report["checks"][k]["published"] == \
            parity_gate.PUBLISHED["rangeldm_nuscenes"][k]

    # loosened targets re-gate the existing samples to PASS
    code = parity_gate.main([
        "--weights", weights, "--data", nus_root, "--out", out,
        "--samples", "4", "--skip_sampling", "--fp32",
        "--mmd_target", "1e6", "--jsd_target", "1e6"])
    assert code == 0


def test_error_exit_code_is_2_not_fail(tmp_path, capsys):
    """The documented contract (parity_gate.py:21): 0 PASS, 1 FAIL, 2 error.
    An infrastructure error (bogus --weights dir) must exit 2 — exiting 1
    would record it as 'released weights failed parity' in CI."""
    from rangeldm_tpu import parity_gate
    rc = parity_gate.main(["--weights", str(tmp_path / "nope"),
                           "--data", str(tmp_path / "nodata")])
    assert rc == 2
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["pass"] is None and "error" in rep
