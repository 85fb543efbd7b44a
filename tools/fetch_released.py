#!/usr/bin/env python
"""Release-day fetcher: download the published RangeLDM checkpoints +
sample sets and the RangeNet++ darknet53-1024 weights, verify them, and
print the exact parity_gate command per model.

URL table mirrors /root/reference/README.md:8-17 (PKU-Disk share links)
and metrics/metrics.md:10-16 (darknet53-1024). The north-star run
(BASELINE.md: MMD/JSD within 5% of the published rows) is then:

    python tools/fetch_released.py --dest released/
    python -m rangeldm_tpu.parity_gate --weights released/rangeldm_kitti360 \
        --data $KITTI360_DATASET [--rangenet released/darknet53-1024]

This sandbox has zero egress, so CI exercises only the URL table and the
--dry_run plumbing (tests/test_fetch_released.py); the download path uses
stdlib urllib so the script runs anywhere Python does.

PKU-Disk share links resolve to a browser landing page, not a direct
file; `--direct_url NAME=URL` overrides any row once the concrete asset
URL is known (the share UI exposes one), and `--from_file NAME=PATH`
registers an already-downloaded archive so verification + layout checks
still run.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import os
import sys
import tarfile
import zipfile
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class Release:
    name: str
    url: str
    approx_mb: Optional[int]            # from the README table, sanity bound
    kind: str                           # 'pipeline' | 'samples' | 'rangenet'
    # expected members once extracted/laid out (subset check)
    expect: tuple = ()
    sha256: Optional[str] = None        # unknown until first real download
    note: str = ""


# /root/reference/README.md:8-10 (KITTI-360 rows), :15-16 (nuScenes row),
# metrics/metrics.md:12 (darknet53-1024 direct link).
RELEASES: Dict[str, Release] = {r.name: r for r in [
    Release(
        name="rangeldm_kitti360",
        url="https://disk.pku.edu.cn/link/AA526388EF6AA34255BD62158520CC343D",
        approx_mb=115, kind="pipeline",
        expect=("unet/config.json", "vae/config.json",
                "scheduler/scheduler_config.json"),
        note="RangeLDM KITTI-360: MMD 3.07e-5 / FRD 1074.9 / JSD 0.045"),
    Release(
        name="rangeldm_kitti360_samples",
        url="https://disk.pku.edu.cn/link/AA734EA9B6BDF245F5B1F7F4ABE4A4E754",
        approx_mb=None, kind="samples", note="1k generated point clouds"),
    Release(
        name="rangedm_kitti360",
        url="https://disk.pku.edu.cn/link/AA077B0EF8964145A3A37EA0BEF54EBD69",
        approx_mb=401, kind="pipeline",
        expect=("unet/config.json", "scheduler/scheduler_config.json"),
        note="RangeDM KITTI-360 (pixel-space): MMD 4.14e-5 / FRD 899.0 / "
             "JSD 0.040"),
    Release(
        name="rangedm_kitti360_samples",
        url="https://disk.pku.edu.cn/link/AA36A72F9CB4B6404686629B27CEDBA321",
        approx_mb=None, kind="samples", note="1k generated point clouds"),
    Release(
        name="rangeldm_nuscenes",
        url="https://disk.pku.edu.cn/link/AA353D9629263C44C99CB7C5B64875C166",
        approx_mb=153, kind="pipeline",
        expect=("unet/config.json", "vae/config.json",
                "scheduler/scheduler_config.json"),
        note="RangeLDM nuScenes: MMD 1.9e-4 / JSD 0.054"),
    Release(
        name="rangeldm_nuscenes_samples",
        url="https://disk.pku.edu.cn/link/AA414B91DFA62C4E5DA5D0DB706616D18B",
        approx_mb=None, kind="samples", note="1k generated point clouds"),
    Release(
        name="darknet53-1024",
        url="http://www.ipb.uni-bonn.de/html/projects/bonnetal/lidar/"
            "semantic/models/darknet53-1024.tar.gz",
        approx_mb=380, kind="rangenet",
        expect=("backbone", "segmentation_decoder", "segmentation_head"),
        note="RangeNet++ FRD feature extractor (metrics/metrics.md:12)"),
]}


def gate_command(name: str, dest: str) -> Optional[str]:
    """The exact release-day command for a fetched pipeline."""
    r = RELEASES[name]
    if r.kind != "pipeline":
        return None
    data = ("$NUSCENES_DATASET" if "nuscenes" in name
            else "$KITTI360_DATASET")
    cmd = (f"python -m rangeldm_tpu.parity_gate "
           f"--weights {os.path.join(dest, name)} --data {data}")
    if "kitti360" in name:
        cmd += (f" --rangenet {os.path.join(dest, 'darknet53-1024')}"
                f"  # optional: adds the FRD row")
    return cmd


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _extract(archive: str, out_dir: str):
    if tarfile.is_tarfile(archive):
        with tarfile.open(archive) as t:
            t.extractall(out_dir, filter="data")
    elif zipfile.is_zipfile(archive):
        with zipfile.ZipFile(archive) as z:
            z.extractall(out_dir)
    else:
        raise ValueError(f"{archive}: neither tar nor zip")


def verify(name: str, dest: str) -> dict:
    """Size/checksum/layout verification of a fetched+extracted release."""
    r = RELEASES[name]
    root = os.path.join(dest, name)
    report = {"name": name, "root": root, "ok": True, "problems": []}
    if not os.path.isdir(root):
        return {**report, "ok": False, "problems": [f"{root} missing"]}
    # layout: expected members may sit one level down (archives often wrap
    # a single top dir) — accept either
    for member in r.expect:
        direct = os.path.join(root, member)
        nested = [os.path.join(root, d, member) for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d))]
        if not (os.path.exists(direct)
                or any(os.path.exists(n) for n in nested)):
            report["ok"] = False
            report["problems"].append(f"missing {member}")
    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(root) for f in fs)
    report["total_mb"] = round(total / 2**20, 1)
    if r.approx_mb and not (0.5 * r.approx_mb <= report["total_mb"]
                            <= 3 * r.approx_mb):
        report["ok"] = False
        report["problems"].append(
            f"size {report['total_mb']}MB far from published ~{r.approx_mb}MB"
            " (truncated download or wrong link?)")
    return report


def fetch(name: str, dest: str, direct_url: Optional[str] = None,
          from_file: Optional[str] = None, dry_run: bool = False) -> dict:
    r = RELEASES[name]
    url = direct_url or r.url
    os.makedirs(dest, exist_ok=True)
    archive = os.path.join(dest, name + ".download")
    plan = {"name": name, "url": url, "archive": archive,
            "extract_to": os.path.join(dest, name),
            "command": gate_command(name, dest)}
    if dry_run:
        return {**plan, "dry_run": True}
    if from_file:
        archive = from_file
        plan["archive"] = archive
    else:
        if direct_url is None and "disk.pku.edu.cn/link" in url:
            raise SystemExit(
                f"{name}: {url} is a PKU-Disk SHARE page, not a direct "
                f"file. Open it in a browser, copy the real download URL, "
                f"and re-run with --direct_url {name}=<url> (or download "
                f"manually and use --from_file {name}=<path>).")
        import urllib.request
        print(f"[fetch] {name} <- {url}")
        urllib.request.urlretrieve(url, archive)   # noqa: S310 — https/http
    if r.sha256 and _sha256(archive) != r.sha256:
        raise SystemExit(f"{name}: sha256 mismatch — corrupt download")
    plan["sha256"] = _sha256(archive)
    _extract(archive, plan["extract_to"])
    plan["verify"] = verify(name, dest)
    return plan


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--dest", default="released")
    ap.add_argument("--only", nargs="*", choices=sorted(RELEASES),
                    help="fetch a subset (default: the three pipelines + "
                         "darknet53-1024; sample sets are opt-in)")
    ap.add_argument("--direct_url", action="append", default=[],
                    metavar="NAME=URL",
                    help="override a row's URL with the resolved direct link")
    ap.add_argument("--from_file", action="append", default=[],
                    metavar="NAME=PATH",
                    help="use an already-downloaded archive for a row")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the fetch/verify plan + the per-model "
                         "parity_gate commands without touching the network")
    args = ap.parse_args(argv)

    overrides = dict(kv.split("=", 1) for kv in args.direct_url)
    local = dict(kv.split("=", 1) for kv in args.from_file)
    unknown = (set(overrides) | set(local)) - set(RELEASES)
    if unknown:
        ap.error(f"unknown release name(s): {sorted(unknown)}")
    names = args.only or [n for n, r in RELEASES.items()
                          if r.kind in ("pipeline", "rangenet")]
    results = []
    for name in names:
        results.append(fetch(name, args.dest,
                             direct_url=overrides.get(name),
                             from_file=local.get(name),
                             dry_run=args.dry_run))
    print(json.dumps(results, indent=2))
    if not args.dry_run:
        bad = [r["name"] for r in results if not r.get("verify", {}).get("ok")]
        if bad:
            print(f"[fetch] FAILED verification: {bad}", file=sys.stderr)
            return 1
    print("\nNext (north-star parity run, BASELINE.md):", file=sys.stderr)
    for r in results:
        if r.get("command"):
            print("  " + r["command"], file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
