"""Conditional sampling CLI (the ldm/inference_conditional.py equivalent).

    python -m rangeldm_tpu.sample_conditional --pipeline runs/up/pipeline \
        --mode upsample --data $KITTI360_DATASET --out exp/ --samples 100

Writes the triplet layout the MAE metrics consume
(ldm/inference_conditional.py:141-210): per index i,
  {mode}_result/{i}.npy   — generated log/normalized range image (H, W, C)
  {mode}_target/{i}.npy   — ground truth
  {mode}_input/{i}.npy    — the condition (sparse beams / masked image)
(.npy instead of torch .pth; evaluate.py --mae reads these.)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.data.datasets import DatasetConfig, RangeImageDataset, RangeLoader
from rangeldm_tpu.models.layers import pixel_unshuffle_azimuth
from rangeldm_tpu.pipelines.samplers import conditional_latent_sample
from rangeldm_tpu.sample_ldm import load_any_pipeline
from rangeldm_tpu.training.conditions import encode_masked_image_cond
from rangeldm_tpu.utils.cache import enable_compilation_cache


def build_conditional_sampler(pipe, batch_size: int, mode: str,
                              num_steps: int = 50, factor: int = 4,
                              dtype=jnp.bfloat16, mesh=None,
                              method: str = "ddim"):
    """`mesh` shards the conditional sample batch (noise, condition encode,
    denoise loop, decode) over all its chips, like build_sampler — the TPU
    equivalent of the reference's multi-GPU conditional inference
    (ldm/inference_conditional.py + accelerate PartialState).
    `method='dpmpp'` swaps the DDIM update for DPM-Solver++(2M) — fewer
    steps at matched quality; beyond the reference's DDIM-only pipelines."""
    from rangeldm_tpu.sample_ldm import (_sampling_mesh_shardings,
                                         pipe_pos_encoding)
    unet, up = pipe["unet"], pipe["unet_params"]
    vae, vp = pipe["vae"], pipe["vae_params"]
    sf = pipe["vae_cfg"].scaling_factor
    cfg = pipe["unet_cfg"]
    h, w = cfg.sample_size
    # honor the pipeline's pos-encoding flag: a conditional model trained
    # with the pos channel needs it at sampling too (shipped conditional
    # configs are pos-free, models/zoo.py)
    pos = pipe_pos_encoding(pipe)
    data_shd, repl = _sampling_mesh_shardings(mesh, batch_size)
    jit_kw = {} if mesh is None else {
        # rng replicated, condition inputs batch-sharded, output gathered
        # per-shard; in_shardings is a pytree prefix so one sharding covers
        # the whole cond_inputs dict
        "in_shardings": (repl, data_shd), "out_shardings": data_shd}
    if mesh is not None:
        from rangeldm_tpu.parallel.mesh import replicate
        up, vp = replicate(mesh, up), replicate(mesh, vp)

    def unet_fn(x, t):
        return unet.apply(up, x, t)

    @functools.partial(jax.jit, **jit_kw)
    def sample(rng, cond_inputs):
        if mode == "upsample":
            cond = pixel_unshuffle_azimuth(
                cond_inputs["down"].astype(dtype), factor)
        else:
            rng, sub = jax.random.split(rng)
            cond = encode_masked_image_cond(
                vae, vp, sf, cond_inputs["masked_image"].astype(dtype),
                cond_inputs["inpainting_mask"].astype(dtype), sub)
        # one shared sampler with the unconditional CLI: init_noise_sigma
        # scaling, /scaling_factor, and decode all live in one place
        return conditional_latent_sample(
            unet_fn, lambda z: vae.apply(vp, z, method="decode"),
            pipe["schedule"], rng,
            (batch_size, h, w, cfg.out_channels), sf, cond,
            num_steps=num_steps, pos_encoding=pos, dtype=dtype,
            sharding=data_shd, method=method)

    return sample


def conditional_dataset_config(pipe, data_root: str, sensor: str, mode: str,
                               factor: int, mask_rate: float) -> DatasetConfig:
    """The dataset must produce conditions in the SAME normalization /
    encoding / width / channel count the model was trained with — the
    artifact records them (train_ldm save_final meta['normalization'] and
    the VAE config); a log/inverse- or custom-mean/std-trained model fed
    default-encoded conditions would silently write wrong triplets for
    the MAE evaluation. HF dirs carry no record -> sensor defaults."""
    from rangeldm_tpu.sample_ldm import pipe_image_size
    norm = (pipe.get("meta") or {}).get("normalization") or {}
    _, model_w = pipe_image_size(pipe)
    used = pipe["vae_cfg"].in_channels if pipe["vae_cfg"] else 2
    return DatasetConfig(
        root=data_root, sensor=sensor, width=model_w, used_feature=used,
        downsample=factor if mode == "upsample" else None,
        inpainting=mask_rate if mode == "inpainting" else None,
        mean=norm.get("mean"), std=norm.get("std"),
        log=bool(norm.get("log", False)),
        inverse=bool(norm.get("inverse", False)))


def main():
    from rangeldm_tpu.utils.cache import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", required=True)
    ap.add_argument("--mode", choices=["upsample", "inpainting"],
                    required=True)
    ap.add_argument("--data", default=os.environ.get("KITTI360_DATASET", ""))
    ap.add_argument("--sensor", default="kitti360")
    ap.add_argument("--out", default="cond_samples")
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--method", default="ddim", choices=["ddim", "dpmpp"])
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--mask_rate", type=float, default=0.0625)
    ap.add_argument("--mesh_devices", default="auto",
                    help="local chips to shard each batch over ('auto'/int)")
    args = ap.parse_args()

    enable_compilation_cache()
    from rangeldm_tpu.sample_ldm import resolve_sampling_mesh
    pipe = load_any_pipeline(args.pipeline)
    mesh = resolve_sampling_mesh(args.mesh_devices, args.batch_size)
    sample = build_conditional_sampler(pipe, args.batch_size, args.mode,
                                       args.steps, args.factor, mesh=mesh,
                                       method=args.method)

    prefix = "densification" if args.mode == "upsample" else "inpainting"
    for sub in ("result", "target", "input"):
        os.makedirs(os.path.join(args.out, f"{prefix}_{sub}"), exist_ok=True)

    ds = RangeImageDataset(
        conditional_dataset_config(pipe, args.data, args.sensor, args.mode,
                                   args.factor, args.mask_rate),
        train=False)
    loader = RangeLoader(ds, batch_size=args.batch_size, shuffle=True,
                         seed=0)

    # per-process batch striding (the PartialState sharding of the
    # reference's conditional inference): every process walks the same
    # seed-0 order but computes/writes only its stride, with GLOBAL
    # sample indices so the triplet files never collide across hosts
    proc, nproc = jax.process_index(), jax.process_count()
    written = 0
    covered = 0
    for bi, batch in enumerate(loader):
        if covered >= args.samples:
            break
        covered = min((bi + 1) * args.batch_size, args.samples)
        if bi % nproc != proc:
            continue
        cond_inputs = {k: jnp.asarray(v) for k, v in batch.items()
                       if k in ("down", "masked_image", "inpainting_mask")}
        rng = jax.random.fold_in(jax.random.PRNGKey(0), bi)
        result = np.asarray(sample(rng, cond_inputs), np.float32)
        for j in range(result.shape[0]):
            idx = bi * args.batch_size + j
            if idx >= args.samples:
                break
            np.save(os.path.join(args.out, f"{prefix}_result", f"{idx}.npy"),
                    result[j])
            np.save(os.path.join(args.out, f"{prefix}_target", f"{idx}.npy"),
                    batch["jpg"][j])
            inp = batch.get("down", batch.get("masked_image"))[j]
            np.save(os.path.join(args.out, f"{prefix}_input", f"{idx}.npy"),
                    inp)
            written += 1
    print(f"process {proc}/{nproc}: wrote {written} conditional samples "
          f"to {args.out}")
    if covered < args.samples:
        print(f"warning: dataset exhausted at {covered} < requested "
              f"{args.samples} samples", file=sys.stderr)


if __name__ == "__main__":
    main()
