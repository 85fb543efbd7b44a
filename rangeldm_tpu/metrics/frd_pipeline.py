"""FRD end-to-end harness (X5/X7 equivalent of the RangeNet++ inference run
orchestrated by metrics/metric.py:15-24, 99-135).

Projects generated .bin point clouds and reference scans with the
LiDARGen-style LaserScan projection (metrics histogram.py:210-270: uniform
fov +3/-25, floor binning, descending-depth overwrite), feeds them through
the darknet53 RangeNet (loading the released checkpoint), and computes the
Frechet distance over decoder features.
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.geometry.laserscan import laserscan_project
from rangeldm_tpu.metrics.frd import frd_from_activations, frd_indices
from rangeldm_tpu.metrics.rangenet import (
    KITTI_IMG_MEANS, KITTI_IMG_STDS, RangeNet, convert_rangenet_state_dict,
    preprocess_scan,
)


def load_rangenet(model_dir: str):
    """Load the released darknet53-1024 checkpoint (backbone /
    segmentation_decoder / optional segmentation_head torch files)."""
    from rangeldm_tpu.convert.torch_common import load_torch_state_dict

    def find(name):
        for cand in (name, name + ".pth", name + ".pytorch"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                return load_torch_state_dict(p)
        return None

    backbone = find("backbone")
    decoder = find("segmentation_decoder")
    head = find("segmentation_head")
    if backbone is None or decoder is None:
        raise FileNotFoundError(
            f"backbone/segmentation_decoder not found in {model_dir}")
    variables = convert_rangenet_state_dict(backbone, decoder, head)
    model = RangeNet(with_head=head is not None)
    return model, variables


def _run_batched(fwd, out_dtype, empty_shape, scans, batch_size, h, w):
    """Project each scan (laserscan geometry + normalization) and run the
    jitted per-batch `fwd` over batches, concatenating host results. The
    ragged final batch is padded to `batch_size` (and the pad rows
    dropped) so the darknet forward compiles exactly once — a second
    shape would cost a multi-minute TPU compile for one batch."""
    inputs, outs = [], []

    def flush():
        if not inputs:
            return
        real = len(inputs)
        pad = batch_size - real
        batch = inputs + [inputs[-1]] * pad
        out = np.asarray(fwd(jnp.asarray(np.stack(batch))), out_dtype)
        outs.append(out[:real])
        inputs.clear()

    for pc in scans:
        pr, pxyz, prem, pm = laserscan_project(pc[:, :3], pc[:, 3], h=h, w=w)
        inputs.append(preprocess_scan(pr, pxyz, prem, pm))
        if len(inputs) == batch_size:
            flush()
    flush()
    return np.concatenate(outs) if outs else np.zeros(empty_shape, out_dtype)


def extract_features(model: RangeNet, variables, scans: Iterable[np.ndarray],
                     batch_size: int = 8, h: int = 64,
                     w: int = 1024) -> np.ndarray:
    """scans: iterable of (N, 4) point clouds -> (n, h, w, 32)."""
    @jax.jit
    def fwd(x):
        feats, _ = model.apply(variables, x)
        return feats

    return _run_batched(fwd, np.float32, (0, h, w, 32), scans, batch_size,
                        h, w)


def extract_labels(model: RangeNet, variables, scans: Iterable[np.ndarray],
                   batch_size: int = 8, h: int = 64,
                   w: int = 1024) -> np.ndarray:
    """scans: iterable of (N, 4) point clouds -> (n, h, w) int32 label maps
    (the RangeNet head's argmax — the reference's rangenetpp segmentation
    dump consumed by iou.py; FRD path uses raw argmax, no KNN)."""
    if not model.with_head:
        raise ValueError("RangeNet was loaded without a segmentation head")

    @jax.jit
    def fwd(x):
        _, logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    return _run_batched(fwd, np.int32, (0, h, w), scans, batch_size, h, w)


def _numeric_sorted(files: List[str]) -> List[str]:
    """{i}.npy dumps in index order (the reference pairs result/target by
    integer filename, iou.py:10-23)."""
    def key(f):
        stem = os.path.splitext(os.path.basename(f))[0]
        return (0, int(stem)) if stem.isdigit() else (1, stem)
    return sorted(files, key=key)


def generated_sample_files(sample_dir: str, limit: int) -> List[str]:
    """The sample CLI's unpadded {i}.bin dumps, truncated to `limit` in
    INTEGER index order: a lexicographic sort would select
    {0, 1, 10, 100, 1000, ...} — a different subset than the reference's
    first-N-by-index pairing."""
    files = _numeric_sorted(
        glob.glob(os.path.join(sample_dir, "*.bin")))[:limit]
    if not files:
        raise FileNotFoundError(
            f"no generated .bin samples under {sample_dir}")
    return files


def _dump_files(sample_dir: str, prefix: str, sub: str,
                limit: int) -> List[str]:
    """{prefix}_{sub}/{i}.npy dumps in index order, truncated to limit."""
    files = _numeric_sorted(glob.glob(
        os.path.join(sample_dir, f"{prefix}_{sub}", "*.npy")))[:limit]
    if not files:
        raise FileNotFoundError(
            f"no dumps under {sample_dir}/{prefix}_{sub}")
    return files


def _dump_scans(files: List[str], spec, max_depth: float = 90.0):
    """Load {i}.npy normalized range-image dumps (sample_conditional.py
    triplets), back-project with the training sensor spec, and yield
    depth-filtered (N, 4) point clouds."""
    from rangeldm_tpu.geometry.inverse import to_point_cloud
    for f in files:
        img = np.load(f)
        if img.ndim == 2:
            img = img[..., None]
        pc = np.asarray(to_point_cloud(jnp.asarray(img[None], jnp.float32),
                                       spec))[0]
        depth = np.linalg.norm(pc[:, :3], axis=1)
        pc = pc[(depth > 1e-3) & (depth < max_depth)]
        if pc.shape[1] == 3:
            pc = np.concatenate(
                [pc, np.zeros((len(pc), 1), pc.dtype)], axis=1)
        yield pc.astype(np.float32)


def compute_segmentation_scores(sample_dir: str, prefix: str,
                                rangenet_dir: Optional[str],
                                sensor: str = "kitti360",
                                limit: int = 1000,
                                encoding: str = "linear") -> dict:
    """IoU / accuracy over RangeNet segmentations of conditional result vs
    target dumps (metric.py:71-97: segment both dump dirs, then weighted
    jaccard + pixel accuracy over the paired label maps).

    `encoding` must match the range encoding the dumps were written with
    (the sampler dumps the training normalization verbatim) — decoding
    log/inverse dumps with the linear default would back-project
    geometrically wrong clouds and score garbage silently."""
    if rangenet_dir is None:
        raise ValueError("--rangenet checkpoint dir required for IoU")
    from rangeldm_tpu.geometry import get_spec
    from rangeldm_tpu.metrics.mae import (
        segmentation_accuracy, segmentation_iou,
    )
    spec = get_spec(sensor, log=encoding == "log",
                    inverse=encoding == "inverse")
    if encoding == "none":
        # raw-meter dumps: identity denormalization (the --mae path's
        # _decode('none') analogue) — remapping 'none' to linear would
        # back-project 40*v+20 instead of v, silently
        spec = spec.replace(mean=0.0, std=1.0)
    res_files = _dump_files(sample_dir, prefix, "result", limit)
    tgt_files = _dump_files(sample_dir, prefix, "target", limit)
    rn = [os.path.basename(f) for f in res_files]
    tn = [os.path.basename(f) for f in tgt_files]
    if rn != tn:
        # equal-COUNT dirs can still hold different index sets (a missing
        # dump on one side, an extra on the other) — pairing by position
        # would then silently score result i against target j
        raise ValueError(
            "result/target dumps are not the same index set; differing: "
            f"{sorted(set(rn) ^ set(tn))[:8]}")
    model, variables = load_rangenet(rangenet_dir)
    if not model.with_head:
        raise ValueError("RangeNet was loaded without a segmentation head")

    # one jitted forward serves both dump dirs (a fresh @jax.jit closure
    # per dir would recompile the identical darknet program)
    @jax.jit
    def fwd(x):
        _, logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    res = _run_batched(fwd, np.int32, (0, 64, 1024),
                       _dump_scans(res_files, spec), 8, 64, 1024)
    tgt = _run_batched(fwd, np.int32, (0, 64, 1024),
                       _dump_scans(tgt_files, spec), 8, 64, 1024)
    return {"iou": segmentation_iou(res, tgt),
            "accuracy": segmentation_accuracy(res, tgt)}


def compute_frd_for_dirs(sample_dir: str, reference_files: List[str],
                         rangenet_dir: Optional[str],
                         limit: int = 1000, batch_size: int = 8,
                         h: int = 64, w: int = 1024) -> float:
    """FRD between the generated `{i}.bin` dumps and the held-out scans
    (metrics/metric.py:99-135). Generated files pair/truncate in INTEGER
    index order (sample_ldm writes unpadded names, so a lexicographic sort
    under `limit` would select {0, 1, 10, 100, 1000, ...} — a different
    subset than the reference's first-N). The 4096-dim reference subsample
    is gathered ON DEVICE inside one jitted forward that serves both dirs:
    full (N, 64, 1024, 32) feature stacks are ~8.4 GB/side at the
    reference's N=1000 (the host-side transpose+subsample peaked >25 GB),
    vs ~16 MB/side of activations."""
    if rangenet_dir is None:
        raise ValueError("--rangenet checkpoint dir required for FRD")
    gen_files = generated_sample_files(sample_dir, limit)
    ref_files = list(reference_files[:limit])
    if not ref_files:
        raise FileNotFoundError("no held-out reference scans to score "
                                "against (empty reference_files)")
    model, variables = load_rangenet(rangenet_dir)
    idx = frd_indices(total=h * w * 32)
    idxj = jnp.asarray(idx)

    @jax.jit
    def fwd(x):
        feats, _ = model.apply(variables, x)
        # torch-CHW flatten order, then the reference's fixed subsample
        # (frd.features_to_activations semantics, on device)
        chw = jnp.transpose(feats, (0, 3, 1, 2)).reshape(feats.shape[0], -1)
        return chw[:, idxj]

    def scans(files):
        for f in files:
            yield np.fromfile(f, np.float32).reshape(-1, 4)

    gen_acts = _run_batched(fwd, np.float32, (0, len(idx)), scans(gen_files),
                            batch_size, h, w)
    ref_acts = _run_batched(fwd, np.float32, (0, len(idx)), scans(ref_files),
                            batch_size, h, w)
    return frd_from_activations(gen_acts, ref_acts)
