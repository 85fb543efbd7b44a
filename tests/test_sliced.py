"""Sliced (height-grouped) conv family parity vs an inline torch twin built
on torch's native grouped circular Conv1d (the reference's realization,
vae/sgm/modules/diffusionmodules/model.py:1059-1101), plus encoder/decoder
shape & grammar checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from rangeldm_tpu.models.sliced import (
    SlicedConfig, SlicedConv, SlicedDecoder, SlicedEncoder, SlicedResnetBlock,
)


class TorchSlicedConv(torch.nn.Module):
    """Inline twin of the reference SlicedConv (model.py:1059-1101)."""

    def __init__(self, cin, cout, k, stride, padding, height):
        super().__init__()
        self.cin, self.cout = cin, cout
        self.k, self.s, self.p, self.h = k, stride, padding, height
        self.conv = torch.nn.Conv1d(
            cin * (height + 2 * padding),
            cout // stride * (height + 2 * padding),
            k, stride,
            padding=k // 2 if stride == 1 else 0,
            padding_mode="circular",
            groups=height // 2 + padding)

    def forward(self, x):                     # x: (B, C, W, H)
        x = torch.flatten(x.permute(0, 3, 1, 2), start_dim=1, end_dim=2)
        if self.p:
            x = F.pad(x, (0, 0, self.cin, self.cin))
        if self.s == 2:
            x = F.pad(x, (0, 1))
        x = self.conv(x)
        if self.p:
            x = x[:, self.cout // self.s:self.cout // self.s * (1 + self.h)]
        b, _, w = x.shape
        return x.reshape(b, -1, self.cout, w).permute(0, 2, 3, 1)


@pytest.mark.parametrize("k,stride,padding", [
    (3, 1, 0), (3, 1, 1), (3, 2, 0), (3, 2, 1), (1, 1, 0), (1, 1, 1),
])
def test_sliced_conv_matches_torch(rng, k, stride, padding):
    b, hh, w, cin, cout = 2, 8, 16, 6, 4
    tw = TorchSlicedConv(cin, cout, k, stride, padding, hh)
    x = rng.standard_normal((b, hh, w, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tw(torch.from_numpy(x).permute(0, 3, 2, 1)).numpy()
    ref = np.transpose(ref, (0, 3, 2, 1))     # (B,C,W,H) -> (B,H,W,C)

    m = SlicedConv(cout, k, stride, padding, hh)
    params = {"params": {
        "kernel": jnp.asarray(
            tw.conv.weight.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(tw.conv.bias.detach().numpy()),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sliced_resnet_block_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 32)).astype(np.float32))
    for p in (0, 1):
        m = SlicedResnetBlock(out_channels=64, padding=p, height=8)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 8, 16, 64)
        assert "nin_shortcut" in params["params"]
        assert np.isfinite(np.asarray(y)).all()


def test_sliced_encoder_decoder_roundtrip_shapes(rng):
    cfg = SlicedConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=3, resolution=8)
    enc = SlicedEncoder(cfg)
    dec = SlicedDecoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 2)).astype(np.float32))
    ep = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(ep, x)
    assert z.shape == (2, 4, 8, 6)            # one downsample, double_z
    dp = dec.init(jax.random.PRNGKey(1), z[..., :3])
    y = dec.apply(dp, z[..., :3])
    assert y.shape == (2, 8, 16, 2)
    assert np.isfinite(np.asarray(y)).all()
    # grammar: the padding toggle must produce both phases somewhere
    names = jax.tree_util.tree_leaves_with_path(ep)
    assert any("conv_in" in jax.tree_util.keystr(kp) for kp, _ in names)


@pytest.mark.heavy
def test_sliced_encoder_grads_finite(rng):
    cfg = SlicedConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=2, resolution=8)
    enc = SlicedEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 2)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
