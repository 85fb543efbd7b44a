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


def build_fake_release(tmp_path, rng):
    from safetensors.numpy import save_file
    root = tmp_path / "release"
    ucfg = UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                      block_out_channels=(32, 64),
                      down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                      up_block_types=("AttnUpBlock2D", "UpBlock2D"))
    vcfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)

    for name in ("unet", "unet_ema"):
        d = root / name
        d.mkdir(parents=True)
        sd = make_diffusers_unet_state_dict(rng, ucfg)
        save_file(sd, str(d / "diffusion_pytorch_model.safetensors"))
        with open(d / "config.json", "w") as f:
            json.dump({
                "sample_size": [32, 4],   # diffusers [azimuth, beams]
                "in_channels": 5, "out_channels": 4,
                "layers_per_block": 2,
                "block_out_channels": [32, 64],
                "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
                "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
                "attention_head_dim": 8,
            }, f)

    d = root / "vae"
    d.mkdir()
    save_file(make_diffusers_vae_state_dict(rng, vcfg),
              str(d / "diffusion_pytorch_model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"in_channels": 2, "out_channels": 2,
                   "block_out_channels": [32, 64], "latent_channels": 4,
                   "layers_per_block": 2, "scaling_factor": 0.18215}, f)

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
