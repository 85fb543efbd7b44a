"""Model structure tests: shapes, skip bookkeeping, param-tree layout for the
shipped configs (vae/configs/kitti360.yaml, ldm/configs/{RangeLDM,RangeDM}.yaml)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.vae import (
    AutoencoderKL, VaeConfig, gaussian_kl, gaussian_sample, gaussian_mode,
)
from rangeldm_tpu.models.unet import UNet2D, UNetConfig


KITTI_VAE = VaeConfig()                       # defaults == kitti360.yaml
RANGELDM_UNET = UNetConfig(sample_size=(8, 128))  # tiny latent for tests

RANGEDM_UNET = UNetConfig(
    sample_size=(32, 128),
    in_channels=3, out_channels=2,
    block_out_channels=(32, 32, 64, 64, 128, 128),
    down_block_types=("DownBlock2D",) * 4 + ("AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D") + ("UpBlock2D",) * 4,
)


def test_vae_shapes():
    m = AutoencoderKL(KITTI_VAE)
    x = jnp.zeros((2, 64, 128, 2))
    rngs = {"params": jax.random.PRNGKey(0)}
    params = m.init(rngs, x, rng=jax.random.PRNGKey(1))
    xrec, z, moments = m.apply(params, x, rng=jax.random.PRNGKey(1))
    assert moments.shape == (2, 16, 32, 8)     # 4x spatial down, 2*z ch
    assert z.shape == (2, 16, 32, 4)
    assert xrec.shape == x.shape


def test_vae_param_tree_names():
    m = AutoencoderKL(KITTI_VAE)
    x = jnp.zeros((1, 64, 64, 2))
    params = m.init({"params": jax.random.PRNGKey(0)}, x,
                    rng=jax.random.PRNGKey(1))["params"]
    enc = params["encoder"]
    assert "conv_in" in enc and "conv_out" in enc and "norm_out" in enc
    assert "down_0_block_0" in enc and "down_1_downsample" in enc
    assert "mid_block_1" in enc and "mid_block_2" in enc
    dec = params["decoder"]
    assert "up_2_block_2" in dec and "up_1_upsample" in dec
    # channel-change resblocks get nin_shortcut
    assert "nin_shortcut" in enc["down_1_block_0"]
    assert "nin_shortcut" not in enc["down_0_block_0"]


def test_gaussian_posterior():
    rng = jax.random.PRNGKey(0)
    moments = jnp.concatenate(
        [jnp.full((2, 4, 4, 4), 1.5), jnp.full((2, 4, 4, 4), -1.0)], axis=-1)
    assert gaussian_mode(moments).shape == (2, 4, 4, 4)
    s = gaussian_sample(rng, moments)
    assert s.shape == (2, 4, 4, 4)
    kl = gaussian_kl(moments)
    # closed form: 0.5 * sum(mu^2 + e^lv - 1 - lv) per element
    expect = 0.5 * (1.5**2 + np.exp(-1.0) - 1.0 + 1.0) * 4 * 4 * 4
    np.testing.assert_allclose(np.asarray(kl), expect, rtol=1e-5)


@pytest.mark.parametrize("cfg,in_hw", [
    (RANGELDM_UNET, (8, 128)),
    (RANGEDM_UNET, (32, 128)),
])
def test_unet_shapes(cfg, in_hw):
    m = UNet2D(cfg)
    h, w = in_hw
    x = jnp.zeros((2, h, w, cfg.in_channels))
    t = jnp.array([10, 500])
    params = m.init(jax.random.PRNGKey(0), x, t)
    y = m.apply(params, x, t)
    assert y.shape == (2, h, w, cfg.out_channels)


def test_unet_param_tree_names():
    m = UNet2D(RANGELDM_UNET)
    x = jnp.zeros((1, 8, 128, 5))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0]))["params"]
    assert "conv_in" in params and "conv_out" in params
    assert "time_embedding_linear_1" in params
    # attn blocks present only where configured
    assert "attentions_0" not in params["down_blocks_0"]
    assert "attentions_1" in params["down_blocks_1"]
    assert "attentions_0" in params["mid_block"]
    assert "downsamplers_0" in params["down_blocks_0"]
    assert "downsamplers_0" not in params["down_blocks_3"]
    assert "upsamplers_0" not in params["up_blocks_3"]
    # up block 0 first resnet takes cat(prev, skip) channels
    k = params["up_blocks_0"]["resnets_0"]["conv1"]["kernel"]
    assert k.shape[2] == 256 + 256


def test_unet_timestep_broadcast():
    m = UNet2D(RANGELDM_UNET)
    x = jnp.zeros((2, 8, 128, 5))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array(0))
    y0 = m.apply(params, x, jnp.array(7))
    y1 = m.apply(params, x, jnp.array([7, 7]))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_unet_azimuth_equivariance():
    """Circular convs make the (attention-free) UNet equivariant to azimuth
    rotation up to the pos-encoding channel; with a rolled pos channel the
    output must roll exactly."""
    cfg = UNetConfig(sample_size=(8, 64), in_channels=3, out_channels=2,
                     block_out_channels=(32, 32),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     add_mid_attention=False)
    m = UNet2D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([5]))
    y = m.apply(params, x, jnp.array([5]))
    shift = 8
    y_roll = m.apply(params, jnp.roll(x, shift, axis=2), jnp.array([5]))
    np.testing.assert_allclose(np.asarray(jnp.roll(y, shift, axis=2)),
                               np.asarray(y_roll), rtol=2e-4, atol=2e-4)


def test_attention_use_fused_matches_einsum():
    """use_fused=True (Pallas, interpret off-TPU) == use_fused=False (einsum)
    through the Attention module — also guards the dtype/use_fused field
    ordering (round-1 positional-arg slip bound dtype to use_fused)."""
    import numpy as np
    from rangeldm_tpu.models.unet import Attention
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 32), dtype=np.float32))
    m_f = Attention(head_dim=8, use_fused=False)
    params = m_f.init(jax.random.PRNGKey(0), x)
    y_plain = np.asarray(m_f.apply(params, x))
    y_fused = np.asarray(Attention(head_dim=8, use_fused=True).apply(params, x))
    np.testing.assert_allclose(y_fused, y_plain, rtol=1e-5, atol=1e-5)


def test_unet_use_fused_attention_configurable():
    """use_fused_attention threads from UNetConfig to the blocks."""
    import numpy as np
    from rangeldm_tpu.models.unet import UNetConfig, UNet2D
    cfg = lambda uf: UNetConfig(
        sample_size=(4, 16), in_channels=3, out_channels=2,
        block_out_channels=(32, 32),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        use_fused_attention=uf)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 4, 16, 3), dtype=np.float32))
    t = jnp.zeros((2,), jnp.int32)
    m0 = UNet2D(cfg(False))
    params = m0.init(jax.random.PRNGKey(0), x, t)
    y0 = np.asarray(m0.apply(params, x, t))
    y1 = np.asarray(UNet2D(cfg(True)).apply(params, x, t))
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
