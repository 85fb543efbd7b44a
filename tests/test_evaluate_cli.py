"""End-to-end evaluate CLI test over synthetic generated samples and a
synthetic KITTI-360 held-out reference tree."""

import numpy as np

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
    assert 0 <= results["jsd"] <= 1.0
    # same distribution -> small-ish numbers; different seeds still same
    # generator, so mmd should be near zero
    assert results["mmd"] < 0.05
