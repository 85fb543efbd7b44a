"""Diffusion UNet matching the diffusers `UNet2DModel` block grammar.

Re-implements exactly the features the reference configs exercise
(ldm/configs/{RangeLDM,RangeDM,nuscenes,upsample,inpainting}.yaml +
ldm/train_unconditional.py:237-308): DownBlock2D / AttnDownBlock2D /
UpBlock2D / AttnUpBlock2D, UNetMidBlock2D, positional timestep embedding
(flip_sin_to_cos=True, freq_shift=0), GN32 eps 1e-5, attention_head_dim=8,
silu — with every conv circular on the azimuth axis (the reference applies
this by module surgery, ldm/utils.py:125-203; here it is native).

Layout: NHWC (B, beams, azimuth, C). The reference's `sample_size`
[azimuth, beams] (e.g. [256, 16]) maps to our (beams, azimuth) = (16, 256).

Parameter names mirror diffusers state_dict keys modulo '.'->'_'
(down_blocks_0.resnets_1.conv1, mid_block.attentions_0.to_q, ...) so the
safetensors importer (convert/diffusers_unet.py) is a mechanical rename.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeldm_tpu.models.layers import (
    CircularConv, attention_mh, timestep_embedding, upsample_nearest,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: Tuple[int, int] = (16, 256)       # (beams, azimuth)
    in_channels: int = 5
    out_channels: int = 4
    layers_per_block: int = 2
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "AttnUpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D", "UpBlock2D")
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    add_mid_attention: bool = True
    circular: bool = True
    dropout: float = 0.0
    # None = auto-select the attention implementation per lowering platform
    # (Pallas fused kernel on TPU, einsum elsewhere); True/False forces it.
    use_fused_attention: Optional[bool] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def from_reference(cls, model_config: dict, circular: bool = True):
        """Build from a reference ldm/configs `model_config:` dict (whose
        sample_size is [azimuth, beams])."""
        mc = dict(model_config)
        w, h = mc.pop("sample_size")
        return cls(sample_size=(h, w),
                   in_channels=mc["in_channels"],
                   out_channels=mc["out_channels"],
                   layers_per_block=mc.get("layers_per_block", 2),
                   block_out_channels=tuple(mc["block_out_channels"]),
                   down_block_types=tuple(mc["down_block_types"]),
                   up_block_types=tuple(mc["up_block_types"]),
                   attention_head_dim=mc.get("attention_head_dim", 8),
                   circular=circular)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D ('default' time scale shift): GN -> silu ->
    conv -> (+temb proj) -> GN -> silu -> dropout -> conv (+1x1 shortcut)."""
    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dropout: float = 0.0
    circular: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = jax.nn.silu(h)
        h = CircularConv(self.out_channels, 3, 1, 1, circular=self.circular,
                         dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = CircularConv(self.out_channels, 3, 1, 1, circular=self.circular,
                         dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = CircularConv(self.out_channels, 1, 1, 0, circular=False,
                             dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _ChannelMajorDense(nn.Module):
    """nn.Dense's parameters (kernel (in, out), bias (out,), same names and
    inits) applied on the channel axis of a channel-major (B, C, T) tensor:
    out[b, d, t] = sum_c y[b, c, t] kernel[c, d] + bias[d].

    Used by Attention so the per-head (D, T) sublane layout the Pallas
    kernel wants falls out of the projection as a *free reshape* of the
    (B, C, T) output instead of a materialized (B, T, C) -> (B*H, D, T)
    transpose per q/k/v/out tensor."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, yt: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (yt.shape[1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        yt, kernel, bias = nn.dtypes.promote_dtype(yt, kernel, bias,
                                                   dtype=self.dtype)
        return jnp.einsum("bct,cd->bdt", yt, kernel) + bias[None, :, None]


class Attention(nn.Module):
    """diffusers Attention in its deprecated-AttnBlock configuration:
    GN -> linear q/k/v -> multi-head SDPA (f32 softmax) -> linear out,
    residual connection, rescale factor 1.

    On TPU the SDPA runs as a Pallas fused kernel (ops/attention.py) — the
    head_dim-8 configuration is HBM-bound with materialized scores and the
    fusion is a ~3x UNet-forward speedup; numerics match the plain path
    within compute-dtype rounding (the fused kernel's ones-row trick
    accumulates the softmax denominator in the compute dtype — bf16 under
    mixed precision — where attention_mh keeps it f32).
    `use_fused=None` auto-selects by backend.

    The whole block runs channel-major: one transpose into (B, C, T), the
    q/k/v/out projections are computed there (_ChannelMajorDense, identical
    parameters to nn.Dense), the head split (B, C, T) -> (B*H, D, T) is a
    free reshape, and one transpose back at the end — instead of four
    layout-changing transposes around the kernel.
    """
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    use_fused: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from rangeldm_tpu.ops.attention import (
            _fused_attention_ad, _plain_attention_t, fused_attention_t,
        )
        b, h, w, c = x.shape
        t = h * w
        n_heads = max(c // self.head_dim, 1)
        hd = c // n_heads
        scale = float(hd ** -0.5)
        y = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="group_norm")(x)
        yt = y.reshape(b, t, c).swapaxes(1, 2)               # (B, C, T)
        qt = _ChannelMajorDense(c, self.dtype, name="to_q")(yt)
        kt = _ChannelMajorDense(c, self.dtype, name="to_k")(yt)
        vt = _ChannelMajorDense(c, self.dtype, name="to_v")(yt)
        # head split: channel index = head * head_dim + d (head-major),
        # matching attention_mh's reshape(b, t, heads, hd)
        qt, kt, vt = (u.reshape(b * n_heads, hd, t) for u in (qt, kt, vt))

        from rangeldm_tpu.ops.attention import XLA_EINSUM_MAX_T
        small = t <= XLA_EINSUM_MAX_T   # grid-overhead-bound; XLA wins
        if self.use_fused is True:
            if jax.default_backend() == "tpu":
                # custom-VJP wrapper so the forced-fused path trains
                ot = _fused_attention_ad(qt, kt, vt, scale)
            else:
                # interpret mode off-TPU so the forced path stays testable
                # (forward-only: pallas interpret has no VJP registered)
                ot = fused_attention_t(qt, kt, vt, scale=scale,
                                       interpret=True)
        elif self.use_fused is False or small:
            ot = _plain_attention_t(qt, kt, vt, scale)
        else:
            # resolve per lowering platform: the Pallas kernel on TPU, the
            # einsum path elsewhere (works under init-on-CPU + jit-on-TPU)
            ot = jax.lax.platform_dependent(
                qt, kt, vt,
                tpu=lambda a, b_, c_: _fused_attention_ad(a, b_, c_, scale),
                default=lambda a, b_, c_: _plain_attention_t(a, b_, c_, scale))
        ot = ot.reshape(b, c, t)
        out = _ChannelMajorDense(c, self.dtype, name="to_out_0")(ot)
        return out.swapaxes(1, 2).reshape(b, h, w, c) + x


class Downsample2D(nn.Module):
    """diffusers Downsample2D with the circular swap
    (ldm/utils.py:60-116): 3x3 stride-2, symmetric pad 1 (wrap on azimuth)."""
    out_channels: int
    circular: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return CircularConv(self.out_channels, 3, 2, 1, circular=self.circular,
                            dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """diffusers Upsample2D: nearest 2x + 3x3 conv (circular via surgery)."""
    out_channels: int
    circular: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest(x)
        return CircularConv(self.out_channels, 3, 1, 1, circular=self.circular,
                            dtype=self.dtype, name="conv")(x)


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    with_attn: bool = False
    add_downsample: bool = True
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    circular: bool = True
    use_fused: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        skips = []
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.eps, self.groups,
                              self.dropout, self.circular, self.dtype,
                              name=f"resnets_{j}")(x, temb, deterministic)
            if self.with_attn:
                x = Attention(self.head_dim, self.groups, self.eps,
                              use_fused=self.use_fused, dtype=self.dtype,
                              name=f"attentions_{j}")(x)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, self.circular, self.dtype,
                             name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    with_attn: bool = False
    add_upsample: bool = True
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    circular: bool = True
    use_fused: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skips, temb, deterministic: bool = True):
        for j in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.eps, self.groups,
                              self.dropout, self.circular, self.dtype,
                              name=f"resnets_{j}")(x, temb, deterministic)
            if self.with_attn:
                x = Attention(self.head_dim, self.groups, self.eps,
                              use_fused=self.use_fused, dtype=self.dtype,
                              name=f"attentions_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, self.circular, self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    channels: int
    with_attn: bool = True
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    circular: bool = True
    use_fused: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        x = ResnetBlock2D(self.channels, self.eps, self.groups, self.dropout,
                          self.circular, self.dtype,
                          name="resnets_0")(x, temb, deterministic)
        if self.with_attn:
            x = Attention(self.head_dim, self.groups, self.eps,
                          use_fused=self.use_fused, dtype=self.dtype,
                          name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, self.eps, self.groups, self.dropout,
                          self.circular, self.dtype,
                          name="resnets_1")(x, temb, deterministic)
        return x


class UNet2D(nn.Module):
    """UNet2DModel equivalent. __call__(sample (B,H,W,C), timesteps (B,))."""
    cfg: UNetConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(timesteps, c.block_out_channels[0],
                                  c.flip_sin_to_cos, c.freq_shift,
                                  dtype=self.dtype or sample.dtype)
        temb = nn.Dense(c.time_embed_dim, dtype=self.dtype,
                        name="time_embedding_linear_1")(temb)
        temb = jax.nn.silu(temb)
        temb = nn.Dense(c.time_embed_dim, dtype=self.dtype,
                        name="time_embedding_linear_2")(temb)

        x = CircularConv(c.block_out_channels[0], 3, 1, 1, circular=c.circular,
                         dtype=self.dtype, name="conv_in")(sample)

        common = dict(head_dim=c.attention_head_dim, groups=c.norm_num_groups,
                      eps=c.norm_eps, dropout=c.dropout, circular=c.circular,
                      use_fused=c.use_fused_attention, dtype=self.dtype)
        skips = [x]
        n = len(c.block_out_channels)
        for i, btype in enumerate(c.down_block_types):
            x, blk_skips = DownBlock2D(
                out_channels=c.block_out_channels[i],
                num_layers=c.layers_per_block,
                with_attn=btype == "AttnDownBlock2D",
                add_downsample=i != n - 1,
                name=f"down_blocks_{i}", **common,
            )(x, temb, deterministic)
            skips += blk_skips

        x = UNetMidBlock2D(c.block_out_channels[-1],
                           with_attn=c.add_mid_attention,
                           name="mid_block", **common)(x, temb, deterministic)

        rev = list(reversed(c.block_out_channels))
        for i, btype in enumerate(c.up_block_types):
            x = UpBlock2D(
                out_channels=rev[i],
                num_layers=c.layers_per_block + 1,
                with_attn=btype == "AttnUpBlock2D",
                add_upsample=i != n - 1,
                name=f"up_blocks_{i}", **common,
            )(x, skips, temb, deterministic)
        assert not skips

        x = nn.GroupNorm(c.norm_num_groups, epsilon=c.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = CircularConv(c.out_channels, 3, 1, 1, circular=c.circular,
                         dtype=self.dtype, name="conv_out")(x)
        return x
