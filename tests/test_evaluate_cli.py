"""End-to-end evaluate CLI test over synthetic generated samples and a
synthetic KITTI-360 held-out reference tree."""

import numpy as np
import pytest

from conftest import synthetic_scan


def test_evaluate_mmd_jsd(tmp_path, rng, monkeypatch):
    # generated samples
    gen = tmp_path / "samples"
    gen.mkdir()
    for i in range(4):
        synthetic_scan(rng, n=5000).tofile(gen / f"{i}.bin")
    # fake KITTI held-out drives
    root = tmp_path / "kitti"
    for drive in ("0000_sync", "0002_sync"):
        d = root / "data_3d_raw" / f"2013_05_28_drive_{drive}" / \
            "velodyne_points" / "data"
        d.mkdir(parents=True)
        for i in range(3):
            synthetic_scan(rng, n=5000).tofile(d / f"{i:010d}.bin")
    monkeypatch.setenv("KITTI360_DATASET", str(root))

    from rangeldm_tpu.evaluate import main
    results = main(["--exp", str(gen), "--mmd", "--jsd"])
    assert 0 <= results["mmd"] < 2.0
    # same distribution -> small numbers. JSD is bounded in [0, 1] by
    # construction so an upper bound of 1 would be tautological; the
    # measured same-generator value here is ~0.32 (4-vs-6 small-sample
    # aggregate-histogram floor), while swapped axes / broken
    # normalization saturate toward 1.0 — gate well below that
    assert 0 <= results["jsd"] < 0.5, results["jsd"]
    assert results["mmd"] < 0.05


def _make_rangenet_ckpt(tmp_path):
    """Synthetic darknet53 checkpoint in the released on-disk format."""
    import os, sys, torch
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rangenet_parity import build_torch_rangenet
    bb, dec, head = build_torch_rangenet()
    d = tmp_path / "rangenet"
    d.mkdir()
    torch.save(bb.state_dict(), d / "backbone")
    torch.save(dec.state_dict(), d / "segmentation_decoder")
    torch.save(head.state_dict(), d / "segmentation_head")
    return str(d)


@pytest.mark.heavy
def test_evaluate_iou_accuracy(tmp_path, rng):
    """--iou/--accuracy over synthetic inpainting triplets: label-map
    determinism (identical dumps -> IoU == accuracy == 1) and a perturbed
    result scoring strictly below."""
    from rangeldm_tpu.geometry import get_spec, range_image_np
    from conftest import synthetic_scan

    ckpt = _make_rangenet_ckpt(tmp_path)
    exp = tmp_path / "exp"
    for sub in ("result", "target"):
        (exp / f"inpainting_{sub}").mkdir(parents=True)
    spec = get_spec("kitti360")
    for i in range(2):
        img, _, _ = range_image_np(synthetic_scan(rng, n=8000), spec)
        np.save(exp / "inpainting_target" / f"{i}.npy", img)
        np.save(exp / "inpainting_result" / f"{i}.npy", img)  # identical

    from rangeldm_tpu.evaluate import main
    res = main(["--exp", str(exp), "--iou", "--accuracy",
                "--rangenet", ckpt, "--limit", "2"])
    assert res["iou"] == 1.0 and res["accuracy"] == 1.0

    # perturbed result -> scores drop but stay in [0, 1]
    for i in range(2):
        img = np.load(exp / f"inpainting_target/{i}.npy")
        img[..., 0] += rng.standard_normal(img.shape[:2]).astype(np.float32) * 0.5
        np.save(exp / "inpainting_result" / f"{i}.npy", img)
    res2 = main(["--exp", str(exp), "--iou", "--accuracy",
                 "--rangenet", ckpt, "--limit", "2"])
    assert 0.0 <= res2["iou"] < 1.0
    assert 0.0 <= res2["accuracy"] < 1.0


@pytest.mark.heavy
def test_evaluate_frd_cli(tmp_path, rng, monkeypatch):
    """--frd through main(): dir orchestration, --rangenet/--limit
    forwarding, finite score (VERDICT r3 weak #6). Reference:
    metrics/metric.py:99-135."""
    ckpt = _make_rangenet_ckpt(tmp_path)
    gen = tmp_path / "samples"
    gen.mkdir()
    scans = [synthetic_scan(rng, n=6000) for _ in range(4)]
    for i, s in enumerate(scans):
        s.tofile(gen / f"{i}.bin")
    root = tmp_path / "kitti"
    d = root / "data_3d_raw" / "2013_05_28_drive_0000_sync" / \
        "velodyne_points" / "data"
    d.mkdir(parents=True)
    for i in range(3):
        synthetic_scan(rng, n=6000).tofile(d / f"{i:010d}.bin")
    monkeypatch.setenv("KITTI360_DATASET", str(root))

    # spy on the final distance call to verify --limit truncated BOTH
    # activation stacks, while the real glob/load/project/extract path
    # (incl. the on-device 4096-dim gather) runs
    from rangeldm_tpu.metrics import frd_pipeline
    seen = []
    real_frd = frd_pipeline.frd_from_activations

    def spy(a, b, **kw):
        seen.append((a.shape, b.shape))
        return real_frd(a, b, **kw)

    monkeypatch.setattr(frd_pipeline, "frd_from_activations", spy)

    from rangeldm_tpu.evaluate import main
    res = main(["--exp", str(gen), "--frd", "--rangenet", ckpt,
                "--limit", "2"])
    assert np.isfinite(res["frd"]) and res["frd"] >= 0.0
    (gen_shape, ref_shape), = seen
    assert gen_shape[0] == 2, "--limit not forwarded to the sample dir glob"
    assert ref_shape[0] == 2, "--limit not forwarded to the reference files"
    # the on-device gather hands frd_from_activations the reference's
    # 4096-dim subsample, never a full feature stack
    assert gen_shape[1] == 4096 and ref_shape[1] == 4096

    # missing --rangenet is a clear error, not a crash deep in the stack
    with pytest.raises(ValueError, match="rangenet"):
        main(["--exp", str(gen), "--frd"])
    # FRD is KITTI-only, exactly like the reference metric CLI
    with pytest.raises(SystemExit, match="KITTI-only"):
        main(["--exp", str(gen), "--frd", "--nus", "--rangenet", ckpt])


def test_segmentation_iou_self_consistency(rng):
    from rangeldm_tpu.metrics.mae import (
        segmentation_accuracy, segmentation_iou,
    )
    labels = rng.integers(0, 20, (4, 64, 128))
    assert segmentation_iou(labels, labels) == 1.0
    assert segmentation_accuracy(labels, labels) == 1.0
    other = (labels + 1) % 20
    assert segmentation_iou(other, labels) == 0.0


def test_evaluate_mae_cli(tmp_path, rng):
    """--mae through main(): index-paired loading, --limit honored, and a
    JSON-serializable result (np.float32 leaking from the metric fns used
    to crash json.dumps — caught by an end-to-end CLI drive)."""
    import json as json_mod
    res_d = tmp_path / "densification_result"
    tgt_d = tmp_path / "densification_target"
    res_d.mkdir(), tgt_d.mkdir()
    for i in list(range(3)) + [10]:   # unpadded names incl. a 2-digit one
        np.save(res_d / f"{i}.npy",
                rng.standard_normal((8, 16, 1)).astype(np.float32))
        np.save(tgt_d / f"{i}.npy",
                rng.standard_normal((8, 16, 1)).astype(np.float32))
    from rangeldm_tpu.evaluate import main
    res = main(["--exp", str(tmp_path), "--mae", "--encoding", "linear",
                "--limit", "3"])
    json_mod.dumps(res)                      # plain floats only
    assert np.isfinite(res["mae"]) and res["mae"] > 0
    assert "mae_bicubic" in res and "mae_nearest" in res
    # mismatched index sets must error, not pair by position
    (res_d / "10.npy").rename(res_d / "11.npy")
    with pytest.raises(SystemExit, match="index set"):
        main(["--exp", str(tmp_path), "--mae", "--encoding", "linear",
              "--limit", "4"])
