"""Numeric torch parity for the RangeNet (FRD extractor) converter.

Round-1 had a confirmed kernel-transpose bug: convert_rangenet_state_dict
used the RangeLDM-stack (B,C,W,H) transpose on RangeNet's standard NCHW
weights, spatially transposing every 3x3 kernel. These tests rebuild the
actual darknet53 blocks in torch inline — with the reference's module/key
naming (backbones/darknet.py:10-150, decoders/darknet.py:12-117,
modules/segmentator.py head) — share random weights through
convert_rangenet_state_dict, and assert forward equality.
"""

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from rangeldm_tpu.metrics.rangenet import (
    RangeNet, UpConvW, convert_rangenet_state_dict,
)


class TBasic(nn.Module):
    """BasicBlock (backbones/darknet.py:10-33): 1x1 bottleneck + 3x3, residual."""

    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes[0], 1, 1, 0, bias=False)
        self.bn1 = nn.BatchNorm2d(planes[0])
        self.relu1 = nn.LeakyReLU(0.1)
        self.conv2 = nn.Conv2d(planes[0], planes[1], 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes[1])
        self.relu2 = nn.LeakyReLU(0.1)

    def forward(self, x):
        out = self.relu1(self.bn1(self.conv1(x)))
        out = self.relu2(self.bn2(self.conv2(out)))
        return out + x


def make_enc_layer(planes, blocks):
    """_make_enc_layer (backbones/darknet.py:129-148): azimuth-only stride 2."""
    layers = [("conv", nn.Conv2d(planes[0], planes[1], 3, [1, 2], 1,
                                 bias=False)),
              ("bn", nn.BatchNorm2d(planes[1])),
              ("relu", nn.LeakyReLU(0.1))]
    for i in range(blocks):
        layers.append((f"residual_{i}", TBasic(planes[1], planes)))
    return nn.Sequential(OrderedDict(layers))


def make_dec_layer(planes):
    """_make_dec_layer (decoders/darknet.py:96-113): ConvTranspose upconv.
    Note the residual is block(planes[1], planes) — bottleneck widens to
    planes[0] then back."""
    return nn.Sequential(OrderedDict([
        ("upconv", nn.ConvTranspose2d(planes[0], planes[1], [1, 4], [1, 2],
                                      [0, 1])),
        ("bn", nn.BatchNorm2d(planes[1])),
        ("relu", nn.LeakyReLU(0.1)),
        ("residual", TBasic(planes[1], planes)),
    ]))


class TBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(5, 32, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.relu1 = nn.LeakyReLU(0.1)
        self.enc1 = make_enc_layer([32, 64], 1)
        self.enc2 = make_enc_layer([64, 128], 2)
        self.enc3 = make_enc_layer([128, 256], 8)
        self.enc4 = make_enc_layer([256, 512], 8)
        self.enc5 = make_enc_layer([512, 1024], 4)

    def forward(self, x):
        # run_layer skip logic (backbones/darknet.py:150-156): record the
        # layer INPUT whenever the layer shrinks the spatial dims.
        skips, os = {}, 1
        x = self.relu1(self.bn1(self.conv1(x)))
        for enc in (self.enc1, self.enc2, self.enc3, self.enc4, self.enc5):
            skips[os] = x.detach()
            os *= 2
            x = enc(x)
        return x, skips


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.dec5 = make_dec_layer([1024, 512])
        self.dec4 = make_dec_layer([512, 256])
        self.dec3 = make_dec_layer([256, 128])
        self.dec2 = make_dec_layer([128, 64])
        self.dec1 = make_dec_layer([64, 32])

    def forward(self, x, skips):
        os = 32
        for dec in (self.dec5, self.dec4, self.dec3, self.dec2, self.dec1):
            x = dec(x)
            os //= 2
            x = x + skips[os].detach()
        return x


def randomize(model, gen):
    """Random weights AND random BN running stats (so stat conversion is
    exercised, not just the identity-stats case)."""
    for m in model.modules():
        if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
            m.weight.data.normal_(0, 0.02, generator=gen)
            if m.bias is not None:
                m.bias.data.normal_(0, 0.02, generator=gen)
        elif isinstance(m, nn.BatchNorm2d):
            m.weight.data.normal_(0.7, 0.1, generator=gen)
            m.bias.data.normal_(0, 0.2, generator=gen)
            m.running_mean.normal_(0, 0.2, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)


def sd_numpy(model):
    return {k: v.numpy().astype(np.float32)
            for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


def build_torch_rangenet(seed=0):
    gen = torch.Generator().manual_seed(seed)
    bb, dec = TBackbone(), TDecoder()
    head = nn.Sequential(nn.Dropout2d(0.0), nn.Conv2d(32, 20, 3, padding=1))
    for m in (bb, dec, head):
        randomize(m, gen)
        m.eval()
    return bb, dec, head


def run_parity(width):
    bb, dec, head = build_torch_rangenet()
    variables = convert_rangenet_state_dict(sd_numpy(bb), sd_numpy(dec),
                                            sd_numpy(head))
    x = torch.randn(1, 5, 64, width,
                    generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        feats_t, skips = bb(x)
        feats_t = dec(feats_t, skips)
        logits_t = head(feats_t)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))   # NCHW -> NHWC
    feats_j, logits_j = RangeNet().apply(variables, xj)
    feats_j = np.asarray(feats_j).transpose(0, 3, 1, 2)
    logits_j = np.asarray(logits_j).transpose(0, 3, 1, 2)

    # A transposed kernel gives O(1)-relative errors; fp32 accumulation noise
    # through 53 layers is ~1e-5 of the activation scale. Gate at 1e-3.
    scale = max(np.abs(feats_t.numpy()).max(), 1.0)
    err = np.abs(feats_j - feats_t.numpy()).max()
    assert err < 1e-3 * scale, f"FRD feature mismatch: {err} (scale {scale})"
    lscale = max(np.abs(logits_t.numpy()).max(), 1.0)
    lerr = np.abs(logits_j - logits_t.numpy()).max()
    assert lerr < 1e-3 * lscale, f"head mismatch: {lerr} (scale {lscale})"


def test_rangenet_converter_forward_parity_small():
    """Same weights, 64x128 input (fully convolutional net — exercises every
    parameter the full-size test does, at 1/8 the compute)."""
    run_parity(width=128)


@pytest.mark.heavy
def test_rangenet_converter_forward_parity_full():
    """The VERDICT gate: max-abs forward diff < 1e-3 at 64x1024x5."""
    run_parity(width=1024)


def test_upconv_matches_torch_convtranspose(rng):
    """UpConvW (lhs-dilated conv) == torch ConvTranspose2d([1,4],[1,2],[0,1])
    through the converter's (2,3,0,1) kernel transpose."""
    tc = nn.ConvTranspose2d(6, 4, [1, 4], [1, 2], [0, 1])
    tc.weight.data.normal_(0, 0.5)
    tc.bias.data.normal_(0, 0.5)
    x = rng.standard_normal((2, 6, 8, 16), dtype=np.float32)
    with torch.no_grad():
        yt = tc(torch.from_numpy(x)).numpy()

    kernel = tc.weight.detach().numpy().transpose(2, 3, 0, 1)  # (1,4,in,out)
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(tc.bias.detach().numpy())}}
    yj = UpConvW(4).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt,
                               rtol=1e-4, atol=1e-5)
