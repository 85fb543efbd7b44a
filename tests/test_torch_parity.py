"""Golden parity tests of JAX layers vs torch-CPU reference semantics.

The reference stack is torch; its circular Conv2d
(vae/sgm/modules/diffusionmodules/model.py:93-108) pads dim -2 (azimuth)
circularly and dim -1 (beams) with zeros on a (B, C, W_azi, H_beam) tensor.
Our canonical layout is (B, H_beam, W_azi, C). These tests build the torch op
inline with shared random weights and check numerical agreement through the
layout/weight transposition used by the checkpoint importers.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.layers import (
    CircularConv, GroupNorm, VaeAttnBlock, VaeResnetBlock, VaeDownsample,
    VaeUpsample, timestep_embedding, attention_mh, PixelUnshuffleAzimuth,
)


def to_torch(x_nhwc):
    # (B, H_beam, W_azi, C) -> (B, C, W_azi, H_beam)
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 2, 1).copy())


def from_torch(x_tref):
    return np.asarray(x_tref.detach().numpy().transpose(0, 3, 2, 1))


def torch_weight(kernel_hwio):
    # (kh_beam, kw_azi, I, O) -> torch (O, I, k_azi, k_beam)
    return torch.from_numpy(np.asarray(kernel_hwio).transpose(3, 2, 1, 0).copy())


def torch_circular_conv(x, w, b, stride=1, padding=1):
    """The reference Conv2d forward (model.py:99-102): circular on dim -2,
    constant on dim -1."""
    if isinstance(padding, int):
        padding = (padding, padding)
    x = F.pad(x, (0, 0, padding[0], padding[0]), mode="circular")
    x = F.pad(x, (padding[1], padding[1], 0, 0), mode="constant")
    return F.conv2d(x, w, b, stride, 0)


@pytest.mark.parametrize("stride,pad", [(1, 1), (1, 2), (2, 1)])
def test_circular_conv_matches_torch(rng, stride, pad):
    x = rng.standard_normal((2, 8, 32, 6), dtype=np.float32)
    k = 2 * pad + 1
    m = CircularConv(10, k, stride, pad, circular=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    w = torch_weight(params["params"]["kernel"])
    b = torch.from_numpy(np.asarray(params["params"]["bias"]))
    yt = torch_circular_conv(to_torch(x), w, b, stride, pad)
    np.testing.assert_allclose(y, from_torch(yt), rtol=1e-4, atol=1e-5)


def test_asymmetric_downsample_matches_torch(rng):
    """VAE Downsample: wrap (0,1) azimuth + zero (0,1) beams, stride 2
    (model.py:164-172)."""
    x = rng.standard_normal((2, 8, 32, 6), dtype=np.float32)
    m = VaeDownsample()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    assert y.shape == (2, 4, 16, 6)

    xt = to_torch(x)
    xt = F.pad(xt, (0, 0, 0, 1), mode="circular")   # azimuth end wrap
    xt = F.pad(xt, (0, 1, 0, 0), mode="constant")   # beams end zero
    w = torch_weight(params["params"]["conv"]["kernel"])
    b = torch.from_numpy(np.asarray(params["params"]["conv"]["bias"]))
    yt = F.conv2d(xt, w, b, 2, 0)
    np.testing.assert_allclose(y, from_torch(yt), rtol=1e-4, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 16, 64), dtype=np.float32)
    m = GroupNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize scale/bias
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape, dtype=np.float32)),
        params)
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    gn = torch.nn.GroupNorm(32, 64, eps=1e-6)
    gn.weight.data = torch.from_numpy(np.asarray(params["params"]["scale"]))
    gn.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
    yt = gn(to_torch(x))
    np.testing.assert_allclose(y, from_torch(yt), rtol=1e-4, atol=1e-5)


def test_vae_resnet_block_matches_torch(rng):
    """Full sgm ResnetBlock vs a torch reimplementation with shared weights
    (model.py:342-362)."""
    x = rng.standard_normal((2, 8, 32, 64), dtype=np.float32)
    m = VaeResnetBlock(out_channels=96, act="silu")
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    xt = to_torch(x)
    p = params

    def gn(t, scope):
        g = torch.nn.GroupNorm(32, t.shape[1], eps=1e-6)
        g.weight.data = torch.from_numpy(np.asarray(p[scope]["scale"]))
        g.bias.data = torch.from_numpy(np.asarray(p[scope]["bias"]))
        return g(t)

    h = gn(xt, "norm1")
    h = F.silu(h)
    h = torch_circular_conv(h, torch_weight(p["conv1"]["kernel"]),
                            torch.from_numpy(np.asarray(p["conv1"]["bias"])))
    h = gn(h, "norm2")
    h = F.silu(h)
    h = torch_circular_conv(h, torch_weight(p["conv2"]["kernel"]),
                            torch.from_numpy(np.asarray(p["conv2"]["bias"])))
    sc = F.conv2d(xt, torch_weight(p["nin_shortcut"]["kernel"]),
                  torch.from_numpy(np.asarray(p["nin_shortcut"]["bias"])))
    np.testing.assert_allclose(y, from_torch(sc + h), rtol=1e-4, atol=1e-5)


def test_vae_attn_block_matches_torch(rng):
    """Single-head conv-QKV attention vs torch SDPA (model.py:391-412)."""
    x = rng.standard_normal((2, 4, 8, 32), dtype=np.float32)
    m = VaeAttnBlock()
    p = m.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": p}, jnp.asarray(x)))

    xt = to_torch(x)
    g = torch.nn.GroupNorm(32, 32, eps=1e-6)
    g.weight.data = torch.from_numpy(np.asarray(p["norm"]["scale"]))
    g.bias.data = torch.from_numpy(np.asarray(p["norm"]["bias"]))
    h = g(xt)

    def c1(t, scope):
        return F.conv2d(t, torch_weight(p[scope]["kernel"]),
                        torch.from_numpy(np.asarray(p[scope]["bias"])))

    q, k, v = c1(h, "q"), c1(h, "k"), c1(h, "v")
    b, c, hh, ww = q.shape
    # reference flattens (h w) on the torch layout; attention is
    # permutation-consistent so flattening (w h) on ours matches through the
    # transposition.
    q, k, v = (t.reshape(b, c, hh * ww).transpose(1, 2).unsqueeze(1)
               for t in (q, k, v))
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.squeeze(1).transpose(1, 2).reshape(b, c, hh, ww)
    o = c1(o, "proj_out")
    np.testing.assert_allclose(y, from_torch(xt + o), rtol=1e-4, atol=1e-5)


def test_multihead_attention_matches_torch(rng):
    q = rng.standard_normal((2, 64, 32), dtype=np.float32)
    k = rng.standard_normal((2, 64, 32), dtype=np.float32)
    v = rng.standard_normal((2, 64, 32), dtype=np.float32)
    y = np.asarray(attention_mh(*map(jnp.asarray, (q, k, v)), n_heads=4))
    qt, kt, vt = (torch.from_numpy(t).reshape(2, 64, 4, 8).transpose(1, 2)
                  for t in (q, k, v))
    yt = F.scaled_dot_product_attention(qt, kt, vt)
    yt = yt.transpose(1, 2).reshape(2, 64, 32)
    np.testing.assert_allclose(y, yt.numpy(), rtol=1e-4, atol=1e-5)


def test_timestep_embedding_formula():
    """Matches diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    t = np.array([0.0, 1.0, 57.0, 999.0], dtype=np.float32)
    dim = 128
    emb = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    arg = t[:, None] * freqs[None, :]
    expect = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)
    np.testing.assert_allclose(emb, expect.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_pixel_unshuffle_matches_reference(rng):
    """SparseRangeImageEncoder2 pack order (ldm/encoders.py:90-95)."""
    x = rng.standard_normal((2, 8, 16, 3), dtype=np.float32)
    y = np.asarray(PixelUnshuffleAzimuth(4)(jnp.asarray(x)))
    assert y.shape == (2, 8, 4, 12)

    xt = to_torch(x)  # (B, C, W, H)
    B, C, W, H = xt.shape
    t = torch.flatten(xt.permute(0, 2, 1, 3), start_dim=1, end_dim=2)
    t = t.reshape(B, W // 4, C * 4, H).permute(0, 2, 1, 3)
    np.testing.assert_allclose(y, from_torch(t), rtol=1e-6, atol=1e-6)
