"""Export round-trip tests: our params -> torch-format state dict ->
(re)import must be the identity; key grammar must match the synthetic
reference dicts used in test_convert."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeldm_tpu.convert.diffusers_unet import convert_diffusers_unet_state_dict
from rangeldm_tpu.convert.export import (
    export_unet_state_dict, export_vae_state_dict,
)
from rangeldm_tpu.convert.sgm_vae import convert_sgm_vae_state_dict
from rangeldm_tpu.models.unet import UNet2D, UNetConfig
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig


def trees_equal(a, b):
    eq = jax.tree.map(lambda x, y: bool(np.array_equal(np.asarray(x),
                                                       np.asarray(y))), a, b)
    return all(jax.tree.leaves(eq))


def test_unet_export_round_trip(rng):
    cfg = UNetConfig(sample_size=(8, 32), in_channels=5, out_channels=4,
                     block_out_channels=(32, 64),
                     down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                     up_block_types=("AttnUpBlock2D", "UpBlock2D"))
    m = UNet2D(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 5)),
                    jnp.zeros((1,), jnp.int32))["params"]
    sd = export_unet_state_dict(params)
    # keys follow diffusers grammar
    assert "down_blocks.1.attentions.0.to_q.weight" in sd
    assert "time_embedding.linear_1.weight" in sd
    assert sd["conv_in.weight"].shape == (32, 5, 3, 3)
    back = convert_diffusers_unet_state_dict(sd)
    assert trees_equal(params, back)


def test_vae_export_round_trip(rng):
    cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    m = AutoencoderKL(cfg)
    params = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 16, 64, 2)),
                    rng=jax.random.PRNGKey(1))["params"]
    sd = export_vae_state_dict(params)
    assert "encoder.down.0.block.0.conv1.weight" in sd
    assert "decoder.up.1.upsample.conv.weight" in sd
    assert "encoder.mid.block_1.norm1.weight" in sd
    assert sd["encoder.conv_in.weight"].shape == (32, 2, 3, 3)
    back = convert_sgm_vae_state_dict(sd)
    assert trees_equal(params, back)
