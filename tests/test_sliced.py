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


class TorchSlicedResBlock(torch.nn.Module):
    """Twin of the reference SlicedResnetBlock (model.py:1136-1196),
    relu act, GN32 eps 1e-6, conv1 at p / conv2 at 1-p / nin at p."""

    def __init__(self, cin, cout, p, h):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = TorchSlicedConv(cin, cout, 3, 1, p, h)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = TorchSlicedConv(cout, cout, 3, 1, 1 - p, h)
        self.nin = TorchSlicedConv(cin, cout, 1, 1, p, h) if cin != cout \
            else None

    def forward(self, x):                     # (B, C, W, H)
        h = self.conv1(F.relu(self.norm1(x)))
        h = self.conv2(F.relu(self.norm2(h)))
        if self.nin is not None:
            x = self.nin(x)
        return x + h


@pytest.mark.heavy
def test_sliced_encoder_matches_torch_twin(rng):
    """Full SlicedEncoder forward parity against a torch twin that
    reproduces the reference's padding-toggle state machine
    (model.py:1200-1346) on torch's native grouped circular Conv1d."""
    ch, hh, w = 32, 8, 16
    cfg = SlicedConfig(ch=ch, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=3, resolution=hh, in_channels=2)

    # torch twin, following the construction-order toggles exactly
    torch.manual_seed(0)
    conv_in = TorchSlicedConv(2, ch, 3, 1, 0, hh)          # p=0 -> 1
    blk0 = TorchSlicedResBlock(ch, ch, 1, hh)              # ch==ch: no flip
    down0 = TorchSlicedConv(ch, ch, 3, 2, 1, hh)           # resample: 1 -> 0
    blk1 = TorchSlicedResBlock(ch, 2 * ch, 0, hh // 2)     # ch change: 0 -> 1
    mid1 = TorchSlicedResBlock(2 * ch, 2 * ch, 1, hh // 2)  # -> 0
    mid2 = TorchSlicedResBlock(2 * ch, 2 * ch, 0, hh // 2)  # -> 1
    norm_out = torch.nn.GroupNorm(32, 2 * ch, eps=1e-6)
    conv_out = TorchSlicedConv(2 * ch, 6, 3, 1, 1, hh // 2)
    for m in (conv_in, blk0, down0, blk1, mid1, mid2, norm_out, conv_out):
        for q in m.parameters():
            q.data.normal_(0, 0.2)

    def forward_t(x):                         # (B, C, W, H)
        h = conv_in(x)
        h = blk0(h)
        h = down0(h)
        h = blk1(h)
        h = mid1(h)
        h = mid2(h)
        return conv_out(F.relu(norm_out(h)))

    x = rng.standard_normal((2, hh, w, 2)).astype(np.float32)
    with torch.no_grad():
        ref = forward_t(torch.from_numpy(x).permute(0, 3, 2, 1)).numpy()
    ref = np.transpose(ref, (0, 3, 2, 1))

    def sc(m):
        return {"kernel": jnp.asarray(
                    m.conv.weight.detach().numpy().transpose(2, 1, 0)),
                "bias": jnp.asarray(m.conv.bias.detach().numpy())}

    def gn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def rb(m):
        d = {"norm1": gn(m.norm1), "conv1": sc(m.conv1),
             "norm2": gn(m.norm2), "conv2": sc(m.conv2)}
        if m.nin is not None:
            d["nin_shortcut"] = sc(m.nin)
        return d

    params = {"params": {
        "conv_in": sc(conv_in),
        "down_0_block_0": rb(blk0),
        "down_0_downsample": {"conv": sc(down0)},
        "down_1_block_0": rb(blk1),
        "mid_block_1": rb(mid1),
        "mid_block_2": rb(mid2),
        "norm_out": gn(norm_out),
        "conv_out": sc(conv_out),
    }}
    enc = SlicedEncoder(cfg)
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.heavy
def test_sliced_decoder_matches_torch_twin(rng):
    """Full SlicedDecoder forward parity (mirrored toggle schedule +
    SlicedUpsample's doubled-height conv, model.py:1349-1517)."""
    ch, hh, w = 32, 8, 16
    cfg = SlicedConfig(ch=ch, ch_mult=(1, 2), num_res_blocks=1,
                       z_channels=3, resolution=hh, in_channels=2,
                       out_ch=2)

    torch.manual_seed(1)
    h2 = hh // 2
    conv_in = TorchSlicedConv(3, 2 * ch, 3, 1, 0, h2)       # p=0 -> 1
    mid1 = TorchSlicedResBlock(2 * ch, 2 * ch, 1, h2)       # -> 0
    mid2 = TorchSlicedResBlock(2 * ch, 2 * ch, 0, h2)       # -> 1
    # level i=1: num_res_blocks+1 blocks, no channel change (no flips)
    up1_b0 = TorchSlicedResBlock(2 * ch, 2 * ch, 1, h2)
    up1_b1 = TorchSlicedResBlock(2 * ch, 2 * ch, 1, h2)
    up1_conv = TorchSlicedConv(2 * ch, 2 * ch, 3, 1, 1, hh)  # upsample: 1 -> 0
    # level i=0: first block changes channels (flip 0 -> 1)
    up0_b0 = TorchSlicedResBlock(2 * ch, ch, 0, hh)
    up0_b1 = TorchSlicedResBlock(ch, ch, 1, hh)
    norm_out = torch.nn.GroupNorm(32, ch, eps=1e-6)
    conv_out = TorchSlicedConv(ch, 2, 3, 1, 1, hh)
    mods = (conv_in, mid1, mid2, up1_b0, up1_b1, up1_conv, up0_b0, up0_b1,
            norm_out, conv_out)
    for m in mods:
        for q in m.parameters():
            q.data.normal_(0, 0.2)

    def forward_t(z):                          # (B, C, W, H)
        h = conv_in(z)
        h = mid2(mid1(h))
        h = up1_b1(up1_b0(h))
        h = torch.nn.functional.interpolate(h, scale_factor=2.0,
                                            mode="nearest")
        h = up1_conv(h)
        h = up0_b1(up0_b0(h))
        return conv_out(F.relu(norm_out(h)))

    z = rng.standard_normal((2, h2, w // 2, 3)).astype(np.float32)
    with torch.no_grad():
        ref = forward_t(torch.from_numpy(z).permute(0, 3, 2, 1)).numpy()
    ref = np.transpose(ref, (0, 3, 2, 1))

    def sc(m):
        return {"kernel": jnp.asarray(
                    m.conv.weight.detach().numpy().transpose(2, 1, 0)),
                "bias": jnp.asarray(m.conv.bias.detach().numpy())}

    def gn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def rb(m):
        d = {"norm1": gn(m.norm1), "conv1": sc(m.conv1),
             "norm2": gn(m.norm2), "conv2": sc(m.conv2)}
        if m.nin is not None:
            d["nin_shortcut"] = sc(m.nin)
        return d

    params = {"params": {
        "conv_in": sc(conv_in),
        "mid_block_1": rb(mid1),
        "mid_block_2": rb(mid2),
        "up_1_block_0": rb(up1_b0),
        "up_1_block_1": rb(up1_b1),
        "up_1_upsample": {"conv": sc(up1_conv)},
        "up_0_block_0": rb(up0_b0),
        "up_0_block_1": rb(up0_b1),
        "norm_out": gn(norm_out),
        "conv_out": sc(conv_out),
    }}
    dec = SlicedDecoder(cfg)
    got = np.asarray(dec.apply(params, jnp.asarray(z)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
