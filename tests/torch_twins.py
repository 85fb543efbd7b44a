"""Shared torch twin models for numeric converter / pipeline parity tests.

These re-implement, INLINE and from the reference's documented semantics,
the exact module structure + state_dict key grammar of
  * the sgm VAE Encoder/Decoder (vae/sgm/modules/diffusionmodules/model.py:
    707-1057; key grammar per ldm/convert_vae.py:14-121), and
  * the diffusers UNet2DModel after circular-conv surgery
    (ldm/train_unconditional.py:237-294, ldm/utils.py:125-203),
generalized over the released config grammars (ldm/configs/RangeLDM.yaml:
4-level 128/128/256/256 attn-heavy; ldm/configs/RangeDM.yaml: 6-level
128..512 with attention only at down-4/up-1; vae/configs/kitti360.yaml:
ch 64 mult [1,2,4]).

torch layout is the RangeLDM stack's (B, C, W_azi, H_beam); ours is
(B, H_beam, W_azi, C).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def to_torch(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 2, 1).copy())


def from_torch(t):
    return np.asarray(t.detach().numpy().transpose(0, 3, 2, 1))


def sd_numpy(model):
    return {k: v.detach().numpy().astype(np.float32)
            for k, v in model.state_dict().items()}


def randomize(model, seed=0, scale=0.08):
    gen = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            m.weight.data.normal_(0, scale, generator=gen)
            if m.bias is not None:
                m.bias.data.normal_(0, scale, generator=gen)
        elif isinstance(m, nn.GroupNorm):
            m.weight.data.normal_(1.0, 0.2, generator=gen)
            m.bias.data.normal_(0, 0.2, generator=gen)


class CConv(nn.Conv2d):
    """Reference circular Conv2d (model.py:93-108 / ldm/utils.py:40-58):
    circular pad on dim -2 (azimuth), zero pad on dim -1 (beams)."""

    def __init__(self, cin, cout, k=3, stride=1, pad=1):
        super().__init__(cin, cout, k, stride, 0)
        self._p = pad

    def forward(self, x):
        p = self._p
        if p:
            x = F.pad(x, (0, 0, p, p), mode="circular")
            x = F.pad(x, (p, p, 0, 0))
        return super().forward(x)


# ---------------------------------------------------------------------------
# sgm VAE twin (model.py:707-1057)
# ---------------------------------------------------------------------------

class SgmRB(nn.Module):
    """sgm ResnetBlock (model.py:301-362), nin_shortcut variant."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = CConv(cin, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = CConv(cout, cout)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class SgmDown(nn.Module):
    """Asymmetric downsample (model.py:151-175): wrap (0,1) azi + zero (0,1)
    beams, stride-2 conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, 2, 0)

    def forward(self, x):
        x = F.pad(x, (0, 0, 0, 1), mode="circular")
        x = F.pad(x, (0, 1, 0, 0))
        return self.conv(x)


class SgmUp(nn.Module):
    """Nearest-2x + circular conv (model.py:110-125)."""

    def __init__(self, ch):
        super().__init__()
        self.conv = CConv(ch, ch)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class SgmEncoder(nn.Module):
    def __init__(self, cin=2, ch=32, mult=(1, 2), nrb=2, zc=4):
        super().__init__()
        self.conv_in = CConv(cin, ch)
        self.down = nn.ModuleList()
        c = ch
        for i, m in enumerate(mult):
            out = ch * m
            level = nn.Module()
            level.block = nn.ModuleList(
                [SgmRB(c if j == 0 else out, out) for j in range(nrb)])
            c = out
            if i != len(mult) - 1:
                level.downsample = SgmDown(c)
            self.down.append(level)
        self.mid = nn.Module()
        self.mid.block_1 = SgmRB(c, c)
        self.mid.block_2 = SgmRB(c, c)
        self.norm_out = nn.GroupNorm(32, c, eps=1e-6)
        self.conv_out = CConv(c, 2 * zc)

    def forward(self, x):
        h = self.conv_in(x)
        for i, level in enumerate(self.down):
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "downsample"):
                h = level.downsample(h)
        h = self.mid.block_2(self.mid.block_1(h))
        return self.conv_out(F.silu(self.norm_out(h)))


class SgmDecoder(nn.Module):
    def __init__(self, cout=2, ch=32, mult=(1, 2), nrb=2, zc=4):
        super().__init__()
        block_in = ch * mult[-1]
        self.conv_in = CConv(zc, block_in)
        self.mid = nn.Module()
        self.mid.block_1 = SgmRB(block_in, block_in)
        self.mid.block_2 = SgmRB(block_in, block_in)
        ups = []
        c = block_in
        for i in reversed(range(len(mult))):
            out = ch * mult[i]
            level = nn.Module()
            level.block = nn.ModuleList(
                [SgmRB(c if j == 0 else out, out) for j in range(nrb + 1)])
            c = out
            if i != 0:
                level.upsample = SgmUp(c)
            ups.insert(0, level)            # model.py builds up with insert(0)
        self.up = nn.ModuleList(ups)
        self.norm_out = nn.GroupNorm(32, c, eps=1e-6)
        self.conv_out = CConv(c, cout)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.block_1(h))
        for level in reversed(self.up):
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "upsample"):
                h = level.upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class SgmVae(nn.Module):
    def __init__(self, cio=2, ch=32, mult=(1, 2), nrb=2, zc=4):
        super().__init__()
        self.encoder = SgmEncoder(cio, ch, mult, nrb, zc)
        self.decoder = SgmDecoder(cio, ch, mult, nrb, zc)


# ---------------------------------------------------------------------------
# diffusers UNet2DModel twin (circular-surgery variant)
# ---------------------------------------------------------------------------

class DifRB(nn.Module):
    """diffusers ResnetBlock2D ('default' time shift), conv_shortcut."""

    def __init__(self, cin, cout, temb):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-5)
        self.conv1 = CConv(cin, cout)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-5)
        self.conv2 = CConv(cout, cout)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class DifAttn(nn.Module):
    """diffusers Attention in the deprecated-AttnBlock configuration
    (linear qkv over flattened tokens, heads = C/8, rescale 1)."""

    def __init__(self, c, head_dim=8):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-5)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])
        self.heads = c // head_dim

    def forward(self, x):
        b, c, w, h = x.shape
        y = self.group_norm(x).view(b, c, w * h).transpose(1, 2)  # (B, T, C)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        d = c // self.heads
        q, k, v = (u.view(b, -1, self.heads, d).transpose(1, 2)
                   for u in (q, k, v))
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, -1, c)
        o = self.to_out[0](o)
        return o.transpose(1, 2).view(b, c, w, h) + x


class DifDown(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = CConv(ch, ch, 3, stride=2, pad=1)

    def forward(self, x):
        return self.conv(x)


class DifUp(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = CConv(ch, ch)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DifUNet(nn.Module):
    """General UNet2DModel twin over the released config grammar: arbitrary
    block_out_channels / (Attn)DownBlock2D / (Attn)UpBlock2D lists,
    layers_per_block, attention_head_dim 8, default time-embedding
    (Timesteps(block_out[0], flip_sin_to_cos=True, freq_shift=0))."""

    def __init__(self, cin=3, cout=2, block_out=(32, 32),
                 down_types=("DownBlock2D", "AttnDownBlock2D"),
                 up_types=("AttnUpBlock2D", "UpBlock2D"), lpb=2):
        super().__init__()
        self.block_out = tuple(block_out)
        temb = block_out[0] * 4
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(block_out[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)
        self.conv_in = CConv(cin, block_out[0])

        n = len(block_out)
        self.down_blocks = nn.ModuleList()
        out_ch = block_out[0]
        for i, t in enumerate(down_types):
            in_ch, out_ch = out_ch, block_out[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [DifRB(in_ch if j == 0 else out_ch, out_ch, temb)
                 for j in range(lpb)])
            if "Attn" in t:
                blk.attentions = nn.ModuleList(
                    [DifAttn(out_ch) for _ in range(lpb)])
            if i != n - 1:
                blk.downsamplers = nn.ModuleList([DifDown(out_ch)])
            self.down_blocks.append(blk)

        mid_ch = block_out[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [DifRB(mid_ch, mid_ch, temb), DifRB(mid_ch, mid_ch, temb)])
        self.mid_block.attentions = nn.ModuleList([DifAttn(mid_ch)])

        rev = list(reversed(block_out))
        self.up_blocks = nn.ModuleList()
        out_ch = rev[0]
        for i, t in enumerate(up_types):
            prev_ch, out_ch = out_ch, rev[i]
            skip_in = rev[min(i + 1, n - 1)]
            blk = nn.Module()
            resnets = []
            for j in range(lpb + 1):
                res_skip = skip_in if j == lpb else out_ch
                res_in = prev_ch if j == 0 else out_ch
                resnets.append(DifRB(res_in + res_skip, out_ch, temb))
            blk.resnets = nn.ModuleList(resnets)
            if "Attn" in t:
                blk.attentions = nn.ModuleList(
                    [DifAttn(out_ch) for _ in range(lpb + 1)])
            if i != n - 1:
                blk.upsamplers = nn.ModuleList([DifUp(out_ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, block_out[0], eps=1e-5)
        self.conv_out = CConv(block_out[0], cout)

    def forward(self, x, t):
        half = self.block_out[0] // 2
        freqs = torch.exp(-np.log(10000.0) * torch.arange(half) / half)
        arg = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(arg), torch.sin(arg)], dim=-1)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(emb)))

        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, rb in enumerate(blk.resnets):
                h = rb(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, rb in enumerate(blk.resnets):
                h = rb(torch.cat([h, skips.pop()], dim=1), temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))
