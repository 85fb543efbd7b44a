"""LPIPS / darknet perceptual losses: torch parity + loss-branch wiring."""

import os

import pytest
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.lpips import (
    LPIPS, DarknetFeatureLoss, convert_lpips_state_dict, make_perceptual_fn,
)


def build_torch_vgg_features():
    """torchvision vgg16 'D' features Sequential (conv/relu/pool indices)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers)


class TorchLPIPS(nn.Module):
    """Inline twin of lpips.py:12-123 (eval mode, dropout inactive)."""

    def __init__(self):
        super().__init__()
        self.features = build_torch_vgg_features()
        self.shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
        self.scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
        chns = [64, 128, 256, 512, 512]
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in chns])
        self.slices = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]

    def feats(self, x):
        outs = []
        h = (x - self.shift) / self.scale
        for a, b in self.slices:
            for i in range(a, b):
                h = self.features[i](h)
            outs.append(h)
        return outs

    def forward(self, x, y):
        fx, fy = self.feats(x), self.feats(y)

        def normalize(t):
            return t / (torch.sqrt(torch.sum(t ** 2, 1, keepdim=True)) + 1e-10)

        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (normalize(a) - normalize(b)) ** 2
            val = val + self.lins[k](d).mean(dim=[2, 3], keepdim=True)
        return val


def test_lpips_matches_torch(rng):
    tm = TorchLPIPS()
    gen = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if isinstance(m, nn.Conv2d):
            m.weight.data.normal_(0, 0.05, generator=gen)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.05, generator=gen)
    for lin in tm.lins:                       # lpips lins are non-negative
        lin.weight.data.uniform_(0, 0.1, generator=gen)
    tm.eval()

    sd = {f"features.{i}.{leaf}": p.detach().numpy()
          for i, mod in enumerate(tm.features)
          if isinstance(mod, nn.Conv2d)
          for leaf, p in (("weight", mod.weight), ("bias", mod.bias))}
    for k, lin in enumerate(tm.lins):
        sd[f"lin{k}.model.1.weight"] = lin.weight.detach().numpy()
    params = convert_lpips_state_dict(sd)

    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32) * 0.5
    y = rng.standard_normal((2, 3, 64, 64), dtype=np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(y)).flatten().numpy()
    got = LPIPS().apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_lpips_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    m = LPIPS()
    params = m.init(jax.random.PRNGKey(0), x, x)
    assert float(jnp.abs(m.apply(params, x, x)).max()) < 1e-6


def test_darknet_feature_loss_properties(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 5), dtype=np.float32))
    y = x + 0.1 * jnp.asarray(
        rng.standard_normal((1, 16, 64, 5), dtype=np.float32))
    m = DarknetFeatureLoss()
    variables = m.init(jax.random.PRNGKey(0), x, x)
    assert float(m.apply(variables, x, x)[0]) < 1e-8
    assert float(m.apply(variables, x, y)[0]) > 0.0


@pytest.mark.heavy
def test_vae_loss_optional_branches(rng):
    """true-range math + BEV rec + perceptual wiring through the gen step."""
    import dataclasses
    from rangeldm_tpu.geometry import get_spec, to_voxel
    from rangeldm_tpu.models.discriminator import NLayerDiscriminator
    from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
    from rangeldm_tpu.training.vae_trainer import (
        VaeLossConfig, create_vae_gan_state, make_disc_apply,
        make_vae_gan_steps, reconstruction_loss, true_range_l1,
    )
    import functools
    import optax

    # true-range formulas
    x = rng.standard_normal((2, 4, 8, 2), dtype=np.float32) * 0.3
    r = rng.standard_normal((2, 4, 8, 2), dtype=np.float32) * 0.3
    log_cfg = VaeLossConfig(encoding="log", use_rec_loss_true=True)
    want = np.abs(64.0 ** x[..., 0] - 64.0 ** r[..., 0]) + \
        10.0 * np.abs(x[..., 1] - r[..., 1])
    np.testing.assert_allclose(
        np.asarray(reconstruction_loss(jnp.asarray(x), jnp.asarray(r),
                                       log_cfg)), want, rtol=1e-5)
    inv_cfg = VaeLossConfig(encoding="inverse", use_rec_loss_true=True,
                            used_feature=1)
    want = np.abs(1 / np.maximum(x[..., 0], 1e-4) -
                  1 / np.maximum(r[..., 0], 1e-4))
    np.testing.assert_allclose(
        np.asarray(true_range_l1(jnp.asarray(x), jnp.asarray(r), inv_cfg)),
        want, rtol=1e-5)
    pow_cfg = VaeLossConfig(encoding="log", use_rec_loss_true_power=True,
                            rec_power=2.0, used_feature=1)
    want = np.abs((64.0 ** x[..., 0]) ** 2 - (64.0 ** r[..., 0]) ** 2)
    np.testing.assert_allclose(
        np.asarray(reconstruction_loss(jnp.asarray(x), jnp.asarray(r),
                                       pow_cfg)), want, rtol=1e-4)

    # full gen/disc steps with bev_rec + vgg perceptual over BEV
    spec = get_spec("kitti360")
    spec = dataclasses.replace(spec, n_beams=32, width=64,
                               height=spec.height[:32], zenith=spec.zenith[:32],
                               grid_sizes=(1, 32, 32))
    cfg = VaeLossConfig(disc_start=0, bev_rec_weight=0.5,
                        perceptual_weight=0.1, bev_perceptual=True)
    vae = AutoencoderKL(VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4))
    disc = NLayerDiscriminator(ndf=16)
    batch = jnp.asarray(rng.standard_normal((2, 32, 64, 2), dtype=np.float32))
    vae_params = vae.init({"params": jax.random.PRNGKey(0)}, batch,
                          rng=jax.random.PRNGKey(1))
    # disc sees the range image (disc_bev=False here)
    disc_vars = disc.init(jax.random.PRNGKey(2), np.asarray(batch))
    state = create_vae_gan_state(vae_params, disc_vars, optax.adam(1e-4),
                                 optax.adam(1e-4), cfg)
    voxel_fn = functools.partial(to_voxel, spec=spec)
    perceptual_fn = make_perceptual_fn(None, kind="vgg")
    gen_step, disc_step = make_vae_gan_steps(
        vae, make_disc_apply(disc), optax.adam(1e-4), optax.adam(1e-4), cfg,
        voxel_fn=voxel_fn, perceptual_fn=perceptual_fn)
    state, gm = gen_step(state, batch, jax.random.PRNGKey(3))
    state, dm = disc_step(state, batch, jax.random.PRNGKey(3))
    for k in ("total_loss", "bev_rec_loss", "p_loss", "d_weight"):
        assert np.isfinite(float(gm[k])), k
    assert float(gm["bev_rec_loss"]) >= 0.0
    assert float(gm["p_loss"]) >= 0.0
    assert np.isfinite(float(dm["disc_loss"]))


def test_vae_loss_disc_bev(rng):
    """disc_bev: the discriminator consumes (B, Gy, Gx, 2) BEV grids."""
    import dataclasses
    import functools
    import optax
    from rangeldm_tpu.geometry import get_spec, to_voxel
    from rangeldm_tpu.models.discriminator import NLayerDiscriminator
    from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
    from rangeldm_tpu.training.vae_trainer import (
        VaeLossConfig, create_vae_gan_state, make_disc_apply,
        make_vae_gan_steps,
    )

    spec = get_spec("kitti360")
    spec = dataclasses.replace(spec, n_beams=32, width=64,
                               height=spec.height[:32], zenith=spec.zenith[:32],
                               grid_sizes=(1, 32, 32))
    cfg = VaeLossConfig(disc_start=0, disc_bev=True)
    vae = AutoencoderKL(VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4))
    disc = NLayerDiscriminator(ndf=16)
    batch = jnp.asarray(rng.standard_normal((2, 32, 64, 2), dtype=np.float32))
    vae_params = vae.init({"params": jax.random.PRNGKey(0)}, batch,
                          rng=jax.random.PRNGKey(1))
    voxel_fn = functools.partial(to_voxel, spec=spec)
    disc_vars = disc.init(jax.random.PRNGKey(2),
                          jnp.transpose(voxel_fn(batch), (0, 2, 3, 1)))
    state = create_vae_gan_state(vae_params, disc_vars, optax.adam(1e-4),
                                 optax.adam(1e-4), cfg)
    gen_step, disc_step = make_vae_gan_steps(
        vae, make_disc_apply(disc), optax.adam(1e-4), optax.adam(1e-4), cfg,
        voxel_fn=voxel_fn)
    state, gm = gen_step(state, batch, jax.random.PRNGKey(3))
    state, dm = disc_step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(gm["total_loss"]))
    assert np.isfinite(float(dm["disc_loss"]))


@pytest.mark.heavy
def test_darknet_perceptual_loads_backbone_checkpoint(tmp_path):
    """make_perceptual_fn(kind='darknet') with a real torch backbone file:
    the converter must accept a backbone-only state dict (no decoder/head)
    and the loaded features must differ from random init (regression: the
    decoder loop used to KeyError on the empty decoder_sd)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rangenet_parity import TBackbone, randomize, sd_numpy

    from rangeldm_tpu.geometry import get_spec
    from rangeldm_tpu.models.lpips import make_perceptual_fn

    gen = torch.Generator().manual_seed(3)
    bb = TBackbone()
    randomize(bb, gen)
    ckpt = tmp_path / "backbone"
    torch.save({k: torch.from_numpy(v) for k, v in sd_numpy(bb).items()},
               str(ckpt))

    spec = get_spec("kitti360")
    fn = make_perceptual_fn(str(ckpt), kind="darknet", spec=spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 2)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 64, 64, 2)).astype(np.float32))
    d = np.asarray(fn(x, y))
    assert d.shape == (1,) and np.isfinite(d).all() and d[0] > 0
    assert np.asarray(fn(x, x))[0] == 0.0
