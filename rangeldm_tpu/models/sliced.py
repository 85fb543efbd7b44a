"""Sliced (height-grouped) conv VAE variants — the reference's experimental
`SlicedConv` / `SlicedResnetBlock` / `SlicedDownsample` / `SlicedUpsample` /
`SlicedEncoder` / `SlicedDecoder` family
(vae/sgm/modules/diffusionmodules/model.py:1059-1517).

No shipped config instantiates these (dead code upstream — nothing imports
them), but they are part of the component inventory (SURVEY.md M8), so the
full family is provided with reference-exact semantics:

  * A "sliced" conv groups the beam rows in PAIRS; each pair owns a private
    k-wide 1D filter bank over the (circular) azimuth axis that mixes the
    two rows' channels. Torch realizes this as `Conv1d(groups=H//2+p,
    padding_mode='circular')` over a (B, H*C, W) flattening
    (model.py:1087-1100).
  * `padding` (0/1) adds one phantom zero row at the top and bottom and is
    TOGGLED between consecutive convs so the pair grouping shifts by one row
    (shifted windows). The post-conv trim is done in flat channel space,
    reproducing the reference's half-group offset for the stride-2/p=1 case
    (model.py:1096-1097) bug-for-bug.
  * stride=2 right-pads azimuth by one zero (the circular padding_mode is
    inert at conv padding 0) and merges each row pair into one row: both
    axes halve (model.py:1092-1093).

Layout: NHWC (B, beams, azimuth, C); the reference's sliced axis is its
dim -1 (beams), i.e. our axis 1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeldm_tpu.models.layers import (
    GroupNorm, VaeAttnBlock, nonlinearity, upsample_nearest,
)


class SlicedConv(nn.Module):
    """Reference-exact sliced conv (model.py:1059-1101).

    Weight layout: (k, 2*in_ch, total_out) — a grouped 1D conv kernel with
    feature_group_count = (H + 2p)//2; torch interchange is
    `weight.permute(2, 1, 0)` of Conv1d's (out, in/groups, k).
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0            # 0/1 phantom-row toggle, NOT spatial padding
    height: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h == self.height, (h, self.height)
        assert self.stride in (1, 2)
        k, s, p = self.kernel_size, self.stride, self.padding
        hp = h + 2 * p
        groups = hp // 2
        in_pg = 2 * c
        out_total = (self.out_channels // s) * hp

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, in_pg, out_total), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (out_total,), jnp.float32)
        dt = self.dtype or x.dtype
        kernel, bias, x = kernel.astype(dt), bias.astype(dt), x.astype(dt)

        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
        # (B, Hp, W, C) -> (B, W, Hp*C), beam-major channel blocks — matching
        # torch's permute(0, 3, 1, 2) + flatten (model.py:1089).
        y = x.transpose(0, 2, 1, 3).reshape(b, w, hp * c)
        if s == 1:
            pad = k // 2
            y = jnp.concatenate([y[:, w - pad:], y, y[:, :pad]], axis=1)
        else:
            y = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))    # right zero pad
        out = jax.lax.conv_general_dilated(
            y[:, None], kernel[None],                    # 2D with dummy H=1
            window_strides=(1, s), padding="VALID",
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, 0]
        out = out + bias
        w_out = out.shape[1]
        if p:
            off = self.out_channels // s
            out = out[..., off:off * (1 + h)]
        # flat channels -> (rows, out_ch), rows = h // s
        out = out.reshape(b, w_out, h // s, self.out_channels)
        return out.transpose(0, 2, 1, 3)


class SlicedDownsample(nn.Module):
    """model.py:1120-1134: sliced stride-2 conv (or 2x2 avg-pool)."""
    with_conv: bool = True
    padding: int = 0
    height: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            return SlicedConv(x.shape[-1], 3, 2, self.padding, self.height,
                              self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), (2, 2))


class SlicedUpsample(nn.Module):
    """model.py:1106-1118: nearest 2x + sliced conv at the doubled height."""
    with_conv: bool = True
    padding: int = 0
    height: int = 64             # input height; conv runs at 2*height
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest(x)
        if self.with_conv:
            x = SlicedConv(x.shape[-1], 3, 1, self.padding, self.height * 2,
                           self.dtype, name="conv")(x)
        return x


class SlicedResnetBlock(nn.Module):
    """model.py:1136-1196: GN -> act -> sliced conv(p) -> GN -> act ->
    dropout -> sliced conv(1-p), 1x1 sliced `nin_shortcut(p)` on channel
    change (temb_ch == 0 in every VAE config, as in VaeResnetBlock)."""
    out_channels: int
    padding: int = 0
    height: int = 64
    dropout: float = 0.0
    act: str = "relu"
    use_conv_shortcut: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        p, hh = self.padding, self.height
        h = GroupNorm(name="norm1", dtype=self.dtype)(x)
        h = nonlinearity(h, self.act)
        h = SlicedConv(self.out_channels, 3, 1, p, hh, self.dtype,
                       name="conv1")(h)
        h = GroupNorm(name="norm2", dtype=self.dtype)(h)
        h = nonlinearity(h, self.act)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = SlicedConv(self.out_channels, 3, 1, 1 - p, hh, self.dtype,
                       name="conv2")(h)
        if in_ch != self.out_channels:
            if self.use_conv_shortcut:
                x = SlicedConv(self.out_channels, 3, 1, p, hh, self.dtype,
                               name="conv_shortcut")(x)
            else:
                x = SlicedConv(self.out_channels, 1, 1, p, hh, self.dtype,
                               name="nin_shortcut")(x)
        return x + h


@dataclasses.dataclass(frozen=True)
class SlicedConfig:
    """Defaults mirror the shipped RangeLDM usage, not the reference class
    defaults: reference SlicedEncoder/SlicedDecoder default
    attn_type='vanilla' with a mid attention block (model.py:1203,1357),
    but the Sliced family is dead code upstream and every shipped config
    in this repo is attention-free, so we default attn_type='none'
    (intentional divergence; pass attn_type='vanilla' for the reference
    structural default)."""
    in_channels: int = 2
    out_ch: int = 2
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    attn_type: str = "none"
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 64             # beam rows (the sliced axis)
    dropout: float = 0.0
    act: str = "relu"                # reference Sliced* default (model.py:1145)
    resamp_with_conv: bool = True
    tanh_out: bool = False
    give_pre_end: bool = False


class SlicedEncoder(nn.Module):
    """model.py:1200-1346, with the reference's padding-toggle state machine:
    start at 0, flip after conv_in, after each channel-changing resblock,
    after each conv resample, and after each mid block."""
    cfg: SlicedConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        p = 0
        curr = c.resolution
        h = SlicedConv(c.ch, 3, 1, p, curr, self.dtype, name="conv_in")(x)
        p = 1 - p
        n_levels = len(c.ch_mult)
        block_in = c.ch
        for i, mult in enumerate(c.ch_mult):
            block_out = c.ch * mult
            for j in range(c.num_res_blocks):
                h = SlicedResnetBlock(block_out, p, curr, c.dropout, c.act,
                                      dtype=self.dtype,
                                      name=f"down_{i}_block_{j}")(
                                          h, deterministic)
                if block_in != block_out:
                    p = 1 - p
                block_in = block_out
                if curr in c.attn_resolutions and c.attn_type != "none":
                    h = VaeAttnBlock(dtype=self.dtype,
                                     name=f"down_{i}_attn_{j}")(h)
            if i != n_levels - 1:
                h = SlicedDownsample(c.resamp_with_conv, p, curr, self.dtype,
                                     name=f"down_{i}_downsample")(h)
                if c.resamp_with_conv:
                    p = 1 - p
                curr //= 2

        h = SlicedResnetBlock(block_in, p, curr, c.dropout, c.act,
                              dtype=self.dtype, name="mid_block_1")(
                                  h, deterministic)
        p = 1 - p
        if c.attn_type != "none":
            h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = SlicedResnetBlock(block_in, p, curr, c.dropout, c.act,
                              dtype=self.dtype, name="mid_block_2")(
                                  h, deterministic)
        p = 1 - p

        h = GroupNorm(name="norm_out", dtype=self.dtype)(h)
        h = nonlinearity(h, c.act)
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        return SlicedConv(out_ch, 3, 1, p, curr, self.dtype,
                          name="conv_out")(h)


class SlicedDecoder(nn.Module):
    """model.py:1349-1517 (same toggle discipline, mirrored)."""
    cfg: SlicedConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        n_levels = len(c.ch_mult)
        block_in = c.ch * c.ch_mult[-1]
        curr = c.resolution // 2 ** (n_levels - 1)
        p = 0
        h = SlicedConv(block_in, 3, 1, p, curr, self.dtype, name="conv_in")(z)
        p = 1 - p
        h = SlicedResnetBlock(block_in, p, curr, c.dropout, c.act,
                              dtype=self.dtype, name="mid_block_1")(
                                  h, deterministic)
        p = 1 - p
        if c.attn_type != "none":
            h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = SlicedResnetBlock(block_in, p, curr, c.dropout, c.act,
                              dtype=self.dtype, name="mid_block_2")(
                                  h, deterministic)
        p = 1 - p

        for i in reversed(range(n_levels)):
            block_out = c.ch * c.ch_mult[i]
            for j in range(c.num_res_blocks + 1):
                h = SlicedResnetBlock(block_out, p, curr, c.dropout, c.act,
                                      dtype=self.dtype,
                                      name=f"up_{i}_block_{j}")(
                                          h, deterministic)
                if block_in != block_out:
                    p = 1 - p
                block_in = block_out
                if curr in c.attn_resolutions and c.attn_type != "none":
                    h = VaeAttnBlock(dtype=self.dtype,
                                     name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = SlicedUpsample(c.resamp_with_conv, p, curr, self.dtype,
                                   name=f"up_{i}_upsample")(h)
                if c.resamp_with_conv:
                    p = 1 - p
                curr *= 2

        if c.give_pre_end:
            return h
        h = GroupNorm(name="norm_out", dtype=self.dtype)(h)
        h = nonlinearity(h, c.act)
        h = SlicedConv(c.out_ch, 3, 1, p, curr, self.dtype, name="conv_out")(h)
        if c.tanh_out:
            h = jnp.tanh(h)
        return h
