"""End-to-end simulation of loading a *released* RangeLDM checkpoint: build
a diffusers-layout pipeline directory on disk (configs + safetensors with
the exact key grammar the reference's save_pretrained emits), load it
through load_diffusers_pipeline, and sample."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig
from test_convert import (
    make_diffusers_unet_state_dict, make_diffusers_vae_state_dict,
)


def build_fake_release(tmp_path, rng, ucfg=None, vcfg="default"):
    """Synthetic released-format dir ({unet, unet_ema, vae, scheduler}/
    with config.json + safetensors — ldm/train_unconditional.py:654-682).
    ucfg/vcfg override the default tiny configs (vcfg=None -> pixel-space
    release with no vae/ subdir, the RangeDM layout)."""
    from safetensors.numpy import save_file
    root = tmp_path / "release"
    if ucfg is None:
        ucfg = UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                          block_out_channels=(32, 64),
                          down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                          up_block_types=("AttnUpBlock2D", "UpBlock2D"))
    if vcfg == "default":
        vcfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)

    for name in ("unet", "unet_ema"):
        d = root / name
        d.mkdir(parents=True)
        sd = make_diffusers_unet_state_dict(rng, ucfg)
        save_file(sd, str(d / "diffusion_pytorch_model.safetensors"))
        with open(d / "config.json", "w") as f:
            json.dump({
                # diffusers stores [azimuth, beams]
                "sample_size": list(ucfg.sample_size)[::-1],
                "in_channels": ucfg.in_channels,
                "out_channels": ucfg.out_channels,
                "layers_per_block": ucfg.layers_per_block,
                "block_out_channels": list(ucfg.block_out_channels),
                "down_block_types": list(ucfg.down_block_types),
                "up_block_types": list(ucfg.up_block_types),
                "attention_head_dim": ucfg.attention_head_dim,
            }, f)

    if vcfg is not None:
        d = root / "vae"
        d.mkdir()
        save_file(make_diffusers_vae_state_dict(rng, vcfg),
                  str(d / "diffusion_pytorch_model.safetensors"))
        with open(d / "config.json", "w") as f:
            json.dump({"in_channels": vcfg.in_channels,
                       "out_channels": vcfg.out_ch,
                       "block_out_channels": [vcfg.ch * m
                                              for m in vcfg.ch_mult],
                       "latent_channels": vcfg.z_channels,
                       "layers_per_block": vcfg.num_res_blocks,
                       "scaling_factor": vcfg.scaling_factor}, f)

    d = root / "scheduler"
    d.mkdir()
    with open(d / "scheduler_config.json", "w") as f:
        json.dump({"num_train_timesteps": 1000, "beta_start": 0.0001,
                   "beta_end": 0.02, "beta_schedule": "linear",
                   "prediction_type": "epsilon", "clip_sample": False,
                   "_class_name": "DDPMScheduler"}, f)
    return str(root)


def test_load_and_sample_released_pipeline(tmp_path, rng):
    from rangeldm_tpu.sample_ldm import build_sampler, load_diffusers_pipeline

    root = build_fake_release(tmp_path, rng)
    pipe = load_diffusers_pipeline(root, dtype=jnp.float32,
                                   image_size=(8, 64))
    assert pipe["unet_cfg"].sample_size == (4, 32)
    assert pipe["vae_cfg"].ch_mult == (1, 2)
    assert pipe["schedule"].cfg.num_train_timesteps == 1000
    # the HF layout records no pos-encoding flag: in-out == 1 identifies
    # the unconditional pos channel (in 5, out 4 here); a conditional
    # in/out gap must infer False (round-3 review fix)
    assert pipe["meta"]["pos_encoding"] is True

    sampler = build_sampler(pipe, batch_size=2, num_steps=3,
                            dtype=jnp.float32)
    imgs = np.asarray(sampler(jax.random.PRNGKey(0)), np.float32)
    assert imgs.shape == (2, 8, 64, 2)
    assert np.isfinite(imgs).all()
