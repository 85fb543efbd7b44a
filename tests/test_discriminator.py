"""Discriminator tests: MetaKernel golden parity vs a torch implementation of
the reference forward (model/model.py:128-153), plus structure checks."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.discriminator import (
    MetaKernel, NLayerDiscriminator, NLayerDiscriminatorMetaKernel,
    _extract_patches,
)


def to_torch(x_nhwc):
    # ours (B, H_beam, W_azi, C) -> torch (B, C, W_azi, H_beam)
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 2, 1).copy())


def from_torch(t):
    return np.asarray(t.detach().numpy().transpose(0, 3, 2, 1))


def torch_metakernel(x, r, p, k=4, stride=2, padding=1, azi=0.1, inc=0.2):
    """The reference MetaKernel.forward in torch, weights from our params."""
    B, C, W, H = x.shape
    azi_t, inc_t = torch.tensor([azi]), torch.tensor([inc])
    cos_azi = torch.zeros(k, k)
    sin_azi = torch.zeros(k, k)
    cos_inc = torch.zeros(k, k)
    sin_inc = torch.zeros(k, k)
    for sh in range(k):
        for sw in range(k):
            cos_azi[sh, sw] = torch.cos(azi_t * (sw - k // 2))
            sin_azi[sh, sw] = torch.sin(azi_t * (sw - k // 2))
            cos_inc[sh, sw] = torch.cos(inc_t * (sh - k // 2))
            sin_inc[sh, sw] = torch.sin(inc_t * (sh - k // 2))
    cos_azi = cos_azi.reshape(1, 1, 1, 1, k, k)
    sin_azi = sin_azi.reshape(1, 1, 1, 1, k, k)
    cos_inc = cos_inc.reshape(1, 1, 1, 1, k, k)
    sin_inc = sin_inc.reshape(1, 1, 1, 1, k, k)

    r = F.pad(r, (padding, padding, 0, 0), value=100.0)
    r = F.pad(r, (0, 0, padding, padding), mode="circular")
    r_patches = r.unfold(3, k, stride).unfold(2, k, stride)
    r_center = r_patches[:, :, :, :, k // 2, k // 2]
    pe0 = r_patches * cos_azi * cos_inc - r_center.unsqueeze(4).unsqueeze(4)
    pe1 = r_patches * cos_azi * sin_inc
    pe2 = r_patches * sin_azi
    pe = torch.cat([pe0, pe1, pe2], dim=1).permute(0, 2, 3, 4, 5, 1)

    w0 = torch.from_numpy(np.asarray(p["mlp_coord_0"]["kernel"]).T.copy())
    b0 = torch.from_numpy(np.asarray(p["mlp_coord_0"]["bias"]))
    w2 = torch.from_numpy(np.asarray(p["mlp_coord_2"]["kernel"]).T.copy())
    b2 = torch.from_numpy(np.asarray(p["mlp_coord_2"]["bias"]))
    weights = F.linear(F.leaky_relu(F.linear(pe, w0, b0), 0.2), w2, b2)
    weights = weights.permute(0, 5, 1, 2, 3, 4)

    x = F.pad(x, (padding, padding, 0, 0))
    x = F.pad(x, (0, 0, padding, padding), mode="circular")
    x_patches = x.unfold(3, k, stride).unfold(2, k, stride)
    x_patches = weights * x_patches
    W_out, H_out = x_patches.shape[2:4]
    x_patches = x_patches.permute(0, 1, 4, 5, 2, 3).reshape(
        B, C * k * k, W_out, H_out)
    # coov: 1x1 conv; our kernel (1, 1, C*k*k, O) -> torch (O, C*k*k, 1, 1)
    cw = torch.from_numpy(
        np.asarray(p["coov"]["kernel"]).transpose(3, 2, 0, 1).copy())
    cb = torch.from_numpy(np.asarray(p["coov"]["bias"]))
    out = F.conv2d(x_patches, cw, cb)
    return out, r_center


def test_extract_patches_matches_unfold(rng):
    x = rng.standard_normal((1, 6, 8, 3), dtype=np.float32)
    pat = np.asarray(_extract_patches(jnp.asarray(x), 4, 2))
    xt = to_torch(x)  # (B, C, W, H)
    tp = xt.unfold(3, 4, 2).unfold(2, 4, 2)  # (B, C, Wo, Ho, kH, kW)
    # ours (B, Ho, Wo, kb, ka, C) vs torch (B, C, Wo, Ho, k_beam, k_azi)
    tp = tp.permute(0, 3, 2, 4, 5, 1).numpy()
    np.testing.assert_allclose(pat, tp, atol=1e-6)


def test_metakernel_matches_torch(rng):
    x = rng.standard_normal((2, 8, 16, 6), dtype=np.float32)
    r = rng.uniform(0.5, 9.0, (2, 8, 16, 1)).astype(np.float32)
    m = MetaKernel(out_channels=5, azi=0.1, inc=0.2)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(r))["params"]
    y, rc = m.apply({"params": p}, jnp.asarray(x), jnp.asarray(r))

    yt, rct = torch_metakernel(to_torch(x), to_torch(r), p)
    np.testing.assert_allclose(np.asarray(y), from_torch(yt),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rc), from_torch(rct),
                               rtol=1e-5, atol=1e-6)


def test_nlayer_discriminator_receptive_field(rng):
    """PatchGAN output spatial dims follow k4 s2 p1 twice + two s1 stages."""
    x = jnp.asarray(rng.standard_normal((1, 64, 1024, 2), dtype=np.float32))
    m = NLayerDiscriminator()
    vs = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(vs, x, mutable=["batch_stats"])
    assert y.shape == (1, 6, 126, 1)


def test_metakernel_discriminator_runs(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 128, 2), dtype=np.float32))
    m = NLayerDiscriminatorMetaKernel()
    vs = m.init(jax.random.PRNGKey(0), x)
    y, muts = m.apply(vs, x, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    # eval mode uses running stats without mutation
    y2 = m.apply(vs, x, train=False)
    assert y2.shape == y.shape


def test_metakernel2_hybrid_runs(rng):
    from rangeldm_tpu.models.discriminator import NLayerDiscriminatorMetaKernel2
    x = jnp.asarray(rng.standard_normal((2, 64, 128, 2), dtype=np.float32))
    m = NLayerDiscriminatorMetaKernel2(ndf=16)
    vs = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(vs, x, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    # same sequential indices as the reference: MK(0), MK(2)+BN(3),
    # conv(5)+BN(6), conv(8)+BN(9), conv(11)
    p = vs["params"]
    for name in ("main_0", "main_2", "main_5", "main_8", "main_11"):
        assert name in p, sorted(p)


def test_metakernel_disc_too_small_input_is_a_clear_error():
    """A mid-stack stride-2 collapse must raise the explicit ValueError,
    not an opaque lax.slice 'limit < start' from inside _extract_patches
    (a 4-beam input collapses 4 -> 2 -> 1 -> 0 under three stride-2
    MetaKernel stages)."""
    import pytest
    m = NLayerDiscriminatorMetaKernel(ndf=8, azi=2 * np.pi / 32,
                                      inc=0.01, n_layers=3)
    x = np.zeros((1, 4, 32, 2), np.float32)
    with pytest.raises(ValueError, match="too small"):
        m.init(jax.random.PRNGKey(0), x)
