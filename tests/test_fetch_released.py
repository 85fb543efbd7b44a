"""Release-day fetcher plumbing (VERDICT r4 next #7): the URL table must
match the published links verbatim, the dry-run plan must print the exact
parity_gate commands, and an already-downloaded archive must flow through
extraction + layout/size verification — all with zero egress."""

import json
import os
import sys
import tarfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import fetch_released  # noqa: E402


def test_url_table_matches_readme():
    """/root/reference/README.md:8-17 + metrics/metrics.md:12 verbatim."""
    R = fetch_released.RELEASES
    assert R["rangeldm_kitti360"].url.endswith(
        "AA526388EF6AA34255BD62158520CC343D")
    assert R["rangedm_kitti360"].url.endswith(
        "AA077B0EF8964145A3A37EA0BEF54EBD69")
    assert R["rangeldm_nuscenes"].url.endswith(
        "AA353D9629263C44C99CB7C5B64875C166")
    assert R["rangeldm_kitti360_samples"].url.endswith(
        "AA734EA9B6BDF245F5B1F7F4ABE4A4E754")
    assert R["rangedm_kitti360_samples"].url.endswith(
        "AA36A72F9CB4B6404686629B27CEDBA321")
    assert R["rangeldm_nuscenes_samples"].url.endswith(
        "AA414B91DFA62C4E5DA5D0DB706616D18B")
    assert R["darknet53-1024"].url == (
        "http://www.ipb.uni-bonn.de/html/projects/bonnetal/lidar/semantic/"
        "models/darknet53-1024.tar.gz")
    # published sizes ride along as sanity bounds
    assert R["rangeldm_kitti360"].approx_mb == 115
    assert R["rangedm_kitti360"].approx_mb == 401
    assert R["rangeldm_nuscenes"].approx_mb == 153
    # every pipeline name is a parity_gate target
    from rangeldm_tpu.parity_gate import PUBLISHED
    for name, r in R.items():
        if r.kind == "pipeline":
            assert name in PUBLISHED


def test_dry_run_plan(capsys):
    code = fetch_released.main(["--dry_run", "--dest", "/tmp/rel"])
    assert code == 0
    out = capsys.readouterr()
    plan = json.loads(out.out)
    names = [p["name"] for p in plan]
    # default set: the three pipelines + darknet53-1024, no sample sets
    assert names == ["rangeldm_kitti360", "rangedm_kitti360",
                     "rangeldm_nuscenes", "darknet53-1024"]
    by_name = {p["name"]: p for p in plan}
    cmd = by_name["rangeldm_kitti360"]["command"]
    assert "parity_gate" in cmd and "--weights /tmp/rel/rangeldm_kitti360" \
        in cmd and "$KITTI360_DATASET" in cmd and "--rangenet" in cmd
    assert "$NUSCENES_DATASET" in by_name["rangeldm_nuscenes"]["command"]
    assert by_name["darknet53-1024"]["command"] is None
    # the north-star commands are echoed for the operator
    assert "parity_gate" in out.err


def test_share_link_requires_direct_url(tmp_path):
    """PKU-Disk share pages are not direct files: a real fetch without
    --direct_url must abort with the actionable message, not download an
    HTML landing page and 'verify' it."""
    with pytest.raises(SystemExit, match="SHARE page"):
        fetch_released.fetch("rangeldm_kitti360", str(tmp_path))


def test_from_file_extract_and_verify(tmp_path):
    """An operator-downloaded archive flows through extraction, layout
    check, and the published-size sanity bound."""
    src = tmp_path / "stage"
    for member in ("unet/config.json", "vae/config.json",
                   "scheduler/scheduler_config.json"):
        p = src / "release" / member
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("{}")
    # pad to within [0.5x, 3x] of the published 115MB
    pad = src / "release" / "unet" / "diffusion_pytorch_model.safetensors"
    pad.write_bytes(np.zeros(60 << 20, np.uint8).tobytes())
    archive = tmp_path / "ckpt.tar.gz"
    with tarfile.open(archive, "w:gz") as t:
        t.add(src / "release", arcname="release")

    plan = fetch_released.fetch("rangeldm_kitti360", str(tmp_path / "dest"),
                                from_file=str(archive))
    assert plan["verify"]["ok"], plan["verify"]["problems"]
    assert plan["sha256"]

    # a truncated/wrong archive fails the size bound
    small = tmp_path / "small.tar.gz"
    with tarfile.open(small, "w:gz") as t:
        t.add(src / "release" / "unet" / "config.json", arcname="unet/config.json")
    plan = fetch_released.fetch("rangeldm_kitti360", str(tmp_path / "dest2"),
                                from_file=str(small))
    assert not plan["verify"]["ok"]
    assert any("far from published" in p for p in plan["verify"]["problems"])
    assert any("missing" in p for p in plan["verify"]["problems"])
