"""Sampling / inference CLI (T3 equivalent of ldm/inference.py and
ldm/inference_conditional.py).

    python -m rangeldm_tpu.sample_ldm --pipeline runs/x/pipeline --samples 1000 \
        --batch_size 32 --out samples/

Writes per sample: `{i}.bin` point cloud (depth < 90 m filter,
ldm/inference.py:173-177), `{i}_bev.png` BEV density image, `{i}_range.png`
range-channel image. Multi-host sharding = per-process sample offsets
(jax.process_index(), replacing accelerate PartialState).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
from rangeldm_tpu.geometry import get_spec, to_voxel
from rangeldm_tpu.models.unet import UNet2D, UNetConfig
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.pipelines.samplers import ddim_sample, ddpm_sample, latent_sample
from rangeldm_tpu.training.checkpoint import load_pipeline_component
from rangeldm_tpu.utils.cache import enable_compilation_cache, init_on_cpu


def is_diffusers_pipeline(path: str) -> bool:
    """Released HF layout: unet/ ships torch weights (safetensors or the
    .bin fallback both loaders support) instead of an orbax params tree."""
    return any(os.path.exists(os.path.join(path, "unet", f))
               for f in ("diffusion_pytorch_model.safetensors",
                         "diffusion_pytorch_model.bin"))


def load_any_pipeline(path: str, dtype=jnp.bfloat16, use_ema: bool = True,
                      **diffusers_kw):
    """Route to the HF-released or native-orbax loader by directory layout.
    Extra keywords (pos_encoding, image_size) apply to the diffusers
    layout only — the orbax layout records them in model_index.json."""
    if is_diffusers_pipeline(path):
        return load_diffusers_pipeline(path, dtype=dtype, use_ema=use_ema,
                                       **diffusers_kw)
    return load_pipeline(path, dtype=dtype, use_ema=use_ema)


def load_pipeline(path: str, dtype=jnp.bfloat16, use_ema: bool = True):
    """Load a pipeline dir written by save_pipeline."""
    with open(os.path.join(path, "model_index.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "unet", "config.json")) as f:
        ucfg_d = json.load(f)
    ucfg_d["sample_size"] = tuple(ucfg_d["sample_size"])
    for k in ("block_out_channels", "down_block_types", "up_block_types",
              "attention_head_dim"):
        if isinstance(ucfg_d.get(k), list):
            ucfg_d[k] = tuple(ucfg_d[k])
    unet_cfg = UNetConfig(**{k: v for k, v in ucfg_d.items()
                             if k in UNetConfig.__dataclass_fields__})
    unet = UNet2D(unet_cfg, dtype=dtype)
    h, w = unet_cfg.sample_size
    template = init_on_cpu(unet.init, jax.random.PRNGKey(0),
                           np.zeros((1, h, w, unet_cfg.in_channels), np.float32),
                           np.zeros((1,), np.int32))["params"]
    which = "unet_ema" if use_ema and os.path.isdir(
        os.path.join(path, "unet_ema")) else "unet"
    unet_params = {"params": load_pipeline_component(path, which, template)}

    vae = vae_params = vae_cfg = None
    if os.path.isdir(os.path.join(path, "vae")):
        with open(os.path.join(path, "vae", "config.json")) as f:
            vcfg_d = json.load(f)
        if isinstance(vcfg_d.get("ch_mult"), list):
            vcfg_d["ch_mult"] = tuple(vcfg_d["ch_mult"])
        if isinstance(vcfg_d.get("attn_resolutions"), list):
            vcfg_d["attn_resolutions"] = tuple(vcfg_d["attn_resolutions"])
        vae_cfg = VaeConfig(**{k: v for k, v in vcfg_d.items()
                               if k in VaeConfig.__dataclass_fields__})
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        img = meta.get("image_size", [64, 1024])
        vt = init_on_cpu(vae.init, {"params": jax.random.PRNGKey(0)},
                         np.zeros((1, img[0], img[1], vae_cfg.in_channels),
                                  np.float32),
                         rng=jax.random.PRNGKey(1))["params"]
        vae_params = {"params": load_pipeline_component(path, "vae", vt)}

    sched = Schedule.create(ScheduleConfig(**{
        k: v for k, v in (meta.get("schedule") or {}).items()
        if k in ScheduleConfig.__dataclass_fields__}))
    return dict(meta=meta, unet=unet, unet_cfg=unet_cfg,
                unet_params=unet_params, vae=vae, vae_cfg=vae_cfg,
                vae_params=vae_params, schedule=sched)


def load_diffusers_pipeline(path: str, dtype=jnp.bfloat16,
                            use_ema: bool = True,
                            image_size=(64, 1024),
                            pos_encoding: Optional[bool] = None):
    """Load a *released* RangeLDM pipeline directory (HF diffusers layout:
    {unet, unet_ema, vae, scheduler}/ with config.json + safetensors,
    ldm/train_unconditional.py:654-682) into our models — the drop-in path
    for users of the reference's published checkpoints."""
    from rangeldm_tpu.convert.diffusers_unet import load_diffusers_unet
    from rangeldm_tpu.convert.diffusers_vae import load_diffusers_vae
    from rangeldm_tpu.models.vae import VaeConfig

    which = "unet_ema" if use_ema and os.path.isdir(
        os.path.join(path, "unet_ema")) else "unet"
    unet_params, unet_cfg = load_diffusers_unet(os.path.join(path, which))
    unet_cfg = dataclasses.replace(unet_cfg, circular=True)
    unet = UNet2D(unet_cfg, dtype=dtype)

    vae = vae_params = vae_cfg = None
    vae_dir = os.path.join(path, "vae")
    if os.path.isdir(vae_dir):
        with open(os.path.join(vae_dir, "config.json")) as f:
            vcfg = json.load(f)
        ch = vcfg["block_out_channels"][0]
        vae_cfg = VaeConfig(
            in_channels=vcfg.get("in_channels", 2),
            out_ch=vcfg.get("out_channels", 2),
            ch=ch,
            ch_mult=tuple(c // ch for c in vcfg["block_out_channels"]),
            num_res_blocks=vcfg.get("layers_per_block", 2),
            z_channels=vcfg.get("latent_channels", 4),
            scaling_factor=vcfg.get("scaling_factor", 0.18215))
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        vae_params = jax.tree.map(jnp.asarray, load_diffusers_vae(vae_dir))

    sched_cfg = {}
    sched_path = os.path.join(path, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_path):
        with open(sched_path) as f:
            sched_cfg = json.load(f)
    sched = Schedule.create(ScheduleConfig(**{
        k: v for k, v in sched_cfg.items()
        if k in ScheduleConfig.__dataclass_fields__}))

    unet_params = jax.tree.map(jnp.asarray, unet_params)
    if pos_encoding is None:
        # the HF layout records nothing about the extra input channels;
        # across all five released configs (models/zoo.py) unconditional
        # UNets have exactly one extra input channel (the pos-encoding)
        # and conditional ones have 8/5 condition channels and NO
        # pos-encoding, so in-out==1 identifies the pos-encoding channel
        pos_encoding = (unet_cfg.in_channels - unet_cfg.out_channels) == 1
    meta = {"pos_encoding": bool(pos_encoding),
            "image_size": list(image_size),
            "source": "diffusers", "schedule": sched_cfg}
    return dict(meta=meta, unet=unet, unet_cfg=unet_cfg,
                unet_params=unet_params, vae=vae, vae_cfg=vae_cfg,
                vae_params=vae_params, schedule=sched)


def pipe_image_size(pipe):
    """(H, W) of the generated range image, derived from the loaded model
    itself (UNet sample_size x VAE down factor) — authoritative for every
    layout: the HF loaders record only a default `image_size` in meta
    (64x1024), which would mis-size the 32-beam nuScenes checkpoint."""
    f = pipe["vae_cfg"].down_factor if pipe["vae_cfg"] else 1
    h, w = pipe["unet_cfg"].sample_size
    return int(h) * f, int(w) * f


def pipe_pos_encoding(pipe) -> bool:
    """The ONE place the pos-encoding flag of a loaded pipeline is decided
    (ADVICE r3: api.py and sample_conditional.py used different defaults).
    Both loaders record it in meta; a hand-built pipe dict without the key
    falls back to the channel-accounting heuristic that identified it for
    the released HF layout: across all five released configs an in-out gap
    of exactly 1 is the pos channel, anything else is condition channels
    (models/zoo.py)."""
    meta = pipe.get("meta") or {}
    if "pos_encoding" in meta:
        return bool(meta["pos_encoding"])
    cfg = pipe["unet_cfg"]
    return (cfg.in_channels - cfg.out_channels) == 1


def _sampling_mesh_shardings(mesh, batch_size: int):
    """(batch sharding, replicated sharding) for mesh-sharded inference, with
    the divisibility check every sampler needs. mesh=None -> (None, None)."""
    if mesh is None:
        return None, None
    from rangeldm_tpu.parallel.mesh import data_sharding, replicated
    n = mesh.size
    if batch_size % n:
        raise ValueError(
            f"batch_size {batch_size} not divisible by mesh size {n}; "
            f"pick a multiple so every chip gets equal work")
    return data_sharding(mesh, 4), replicated(mesh)


def build_sampler(pipe, batch_size: int, num_steps: int = 50,
                  method: str = "ddim", dtype=jnp.bfloat16,
                  eta: float = 0.0, mesh=None):
    """`eta` is the DDIM stochasticity knob the reference pipelines expose
    (DDIMPipelineRange/LDMPipelineRange __call__ eta=0.0); ignored by the
    ancestral ddpm method.

    `mesh` (a jax.sharding.Mesh with one axis) turns the returned program
    into a mesh-sharded one: params replicate, the sample batch shards over
    the mesh axis, and every denoise step runs batch-parallel on all chips —
    the TPU equivalent of the reference's 8-GPU `PartialState` inference
    (ldm/inference.py:56,159). Output is sample-for-sample identical to the
    single-device program for the same rng (noise depends only on key+shape).
    """
    unet, params = pipe["unet"], pipe["unet_params"]
    cfg = pipe["unet_cfg"]
    h, w = cfg.sample_size
    pos = pipe_pos_encoding(pipe)
    data_shd, repl = _sampling_mesh_shardings(mesh, batch_size)
    jit_kw = {} if mesh is None else {"out_shardings": data_shd}
    if mesh is not None:
        from rangeldm_tpu.parallel.mesh import replicate
        params = replicate(mesh, params)

    def unet_fn(x, t):
        return unet.apply(params, x, t)

    if pipe["vae"] is not None:
        vae, vp = pipe["vae"], pipe["vae_params"]
        if mesh is not None:
            from rangeldm_tpu.parallel.mesh import replicate
            vp = replicate(mesh, vp)
        sf = pipe["vae_cfg"].scaling_factor

        def vae_decode(z):
            return vae.apply(vp, z, method="decode")

        @functools.partial(jax.jit, **jit_kw)
        def sample(rng):
            return latent_sample(unet_fn, vae_decode, pipe["schedule"], rng,
                                 (batch_size, h, w, cfg.out_channels), sf,
                                 num_steps=num_steps, method=method,
                                 eta=eta, pos_encoding=pos, dtype=dtype,
                                 sharding=data_shd)
    else:
        @functools.partial(jax.jit, **jit_kw)
        def sample(rng):
            if method in ("ddim", "dpmpp"):
                return ddim_sample(unet_fn, pipe["schedule"], rng,
                                   (batch_size, h, w, cfg.out_channels),
                                   num_steps=num_steps, eta=eta,
                                   pos_encoding=pos, dtype=dtype,
                                   sharding=data_shd, method=method)
            return ddpm_sample(unet_fn, pipe["schedule"], rng,
                               (batch_size, h, w, cfg.out_channels),
                               num_steps=num_steps, pos_encoding=pos,
                               dtype=dtype, sharding=data_shd)

    return sample


def resolve_sampling_mesh(mesh_devices: str, batch_size: int):
    """CLI policy for the inference mesh: 'auto' uses the largest prefix of
    the local devices that divides the batch (a v5e host exposes 4-8 chips
    to ONE process — leaving them idle halves-to-eighths throughput); an
    integer pins the count; <=1 device means no mesh (plain single-device
    jit)."""
    from jax.sharding import Mesh
    from rangeldm_tpu.parallel.mesh import largest_divisible_prefix
    local = jax.local_devices()     # process-LOCAL mesh: composes with the
    n_local = len(local)            # per-process sample-range sharding below
    if str(mesh_devices).strip().lower() == "auto":
        n = largest_divisible_prefix(n_local, batch_size)
    else:
        n = int(mesh_devices)
        if n > n_local:
            raise ValueError(f"--mesh_devices {n} > {n_local} local devices")
    return Mesh(np.asarray(local[:n]), ("data",)) if n > 1 else None


def apply_meta_normalization(spec, meta):
    """Override the registry spec's range normalization/encoding with the
    artifact's own record (train_ldm save_final meta['normalization']): a
    model trained with custom mean/std or log/inverse encoding would
    otherwise back-project systematically mis-scaled clouds under the
    sensor defaults. HF-released dirs carry no record -> no-op (their
    models use the defaults)."""
    norm = (meta or {}).get("normalization")
    if not norm:
        return spec
    kw = {k: norm[k] for k in ("mean", "std", "log", "inverse") if k in norm}
    return spec.replace(**kw)


def adapt_spec_to_model(spec, image_size):
    """Reduce a registry SensorSpec to a model's (H, W) so the CLIs can
    back-project reduced-resolution models (the data pipeline's `width:`
    override, DatasetConfig.width, applied at inference). Slicing the beam
    tables keeps the top H beams' calibration; full-size models pass
    through unchanged."""
    h, w = int(image_size[0]), int(image_size[1])
    if (spec.n_beams, spec.width) == (h, w):
        return spec
    kw = {"width": w}
    if w != spec.width:
        # scale the BEV grid with the azimuth count regardless of whether
        # the beam count also changed, so width-only reduced models get the
        # same density-preserving grid as height+width reduced ones
        kw["grid_sizes"] = (1, max(2, spec.grid_sizes[1] * w // spec.width),
                            max(2, spec.grid_sizes[2] * w // spec.width))
    if h != spec.n_beams:
        kw.update(n_beams=h, height=spec.height[:h], zenith=spec.zenith[:h])
    import sys
    print(f"note: sensor '{spec.name}' reduced to model resolution "
          f"{h}x{w}", file=sys.stderr)
    return spec.replace(**kw)


def save_outputs(images: np.ndarray, spec, out_dir: str, start_idx: int,
                 max_depth: float = 90.0, write_png: bool = True):
    """Back-project and write .bin/.png per sample (ldm/inference.py:159-183)."""
    from PIL import Image
    from rangeldm_tpu.geometry.inverse import to_point_cloud_masked
    imgs = jnp.asarray(images, jnp.float32)
    pcs_j, valid_j = to_point_cloud_masked(imgs, spec, max_depth=max_depth)
    pcs, valid = np.asarray(pcs_j), np.asarray(valid_j)
    bev = np.asarray(to_voxel(imgs, spec))
    os.makedirs(out_dir, exist_ok=True)
    for j in range(images.shape[0]):
        pcs[j][valid[j]].astype(np.float32).tofile(
            os.path.join(out_dir, f"{start_idx + j}.bin"))
        if write_png:
            b = np.clip(bev[j, 0], 0, 1) * 255
            Image.fromarray(b.astype(np.uint8), mode="L").save(
                os.path.join(out_dir, f"{start_idx + j}_bev.png"))
            r = np.clip((images[j, :, :, 0] * spec.std + spec.mean) /
                        spec.range_fill, 0, 1) * 255
            Image.fromarray(r.astype(np.uint8), mode="L").save(
                os.path.join(out_dir, f"{start_idx + j}_range.png"))


def main():
    from rangeldm_tpu.utils.cache import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", required=True)
    ap.add_argument("--out", default="samples")
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--method", default="ddim",
                    choices=["ddim", "ddpm", "dpmpp"],
                    help="dpmpp = DPM-Solver++(2M): same weights, ~2.5x "
                         "fewer steps at matched quality (try --steps 20)")
    ap.add_argument("--eta", type=float, default=0.0,
                    help="DDIM stochasticity (reference pipelines' eta)")
    ap.add_argument("--timestep_spacing", default=None,
                    choices=["leading", "trailing"],
                    help="override the pipeline's inference timestep "
                         "spacing ('trailing' = arXiv:2305.08891, no "
                         "first-step SNR mismatch; default: the "
                         "pipeline's own, 'leading' for the released "
                         "configs)")
    ap.add_argument("--sensor", default=None,
                    help="back-projection geometry (default: the "
                         "artifact's own meta['sensor'] record, else "
                         "kitti360)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh_devices", default="auto",
                    help="local chips to shard each sample batch over: "
                         "'auto' (all local devices that divide the batch), "
                         "an integer, or 1 to disable")
    args = ap.parse_args()

    enable_compilation_cache()
    pipe = load_any_pipeline(args.pipeline)
    if args.timestep_spacing:
        from rangeldm_tpu.diffusion.schedule import Schedule
        pipe["schedule"] = Schedule.create(dataclasses.replace(
            pipe["schedule"].cfg, timestep_spacing=args.timestep_spacing))
    mesh = resolve_sampling_mesh(args.mesh_devices, args.batch_size)
    sample = build_sampler(pipe, args.batch_size, args.steps, args.method,
                           eta=args.eta, mesh=mesh)
    sensor = args.sensor or pipe["meta"].get("sensor", "kitti360")
    spec = apply_meta_normalization(
        adapt_spec_to_model(get_spec(sensor), pipe_image_size(pipe)),
        pipe["meta"])

    # per-process sharding of the sample range (ldm/inference.py:159, 174)
    proc, nproc = jax.process_index(), jax.process_count()
    n_batches = -(-args.samples // args.batch_size)
    written = 0
    for b in range(proc, n_batches, nproc):
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), b)
        imgs = np.asarray(sample(rng), np.float32)
        start = b * args.batch_size
        imgs = imgs[:max(0, min(args.batch_size, args.samples - start))]
        if len(imgs):
            save_outputs(imgs, spec, args.out, start)
            written += len(imgs)
    n_mesh = mesh.size if mesh is not None else 1
    print(f"process {proc}/{nproc} (mesh of {n_mesh} chips): "
          f"wrote {written} samples to {args.out}")


if __name__ == "__main__":
    main()
