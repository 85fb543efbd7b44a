"""Experimental modules from the reference's research surface (M7/M8/M12).

Not used by any shipped config (SURVEY.md section 2.2 marks them
experimental), but part of the component inventory:

  * EdgeConv / EdgeConvResnetBlock / RangeDownSample
    (vae/sgm/modules/diffusionmodules/model.py:127-299): graph-style conv
    over rolled 3x3 neighbourhoods with range positional encodings and a
    variance-min pooling downsample.
  * PerRowConv: an exploratory per-beam-row conv (every row its own 2D
    filter). NOT the reference's SlicedConv — that operator groups beam
    rows in PAIRS of k-wide 1D azimuth filters and lives, torch-parity
    tested, in models/sliced.py (model.py:1059-1133).
  * SparseRangeImageEncoder (ldm/encoders.py:58-84): the learned conv
    variant of the condition encoder (the shipped configs use the
    parameter-free pixel unshuffle, layers.PixelUnshuffleAzimuth).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeldm_tpu.models.layers import CircularConv, GroupNorm, nonlinearity


class EdgeConv(nn.Module):
    """max over 3x3 rolled neighbourhoods of MLP([x_shift, x, pe])
    (model.py:177-231). Layout (B, H=beams, W=azimuth, C); torch shifts
    dims (2, 3) = (azimuth, beams) -> our (axis 2, axis 1)."""
    out_channels: int
    azi: float
    inc: float
    act: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
        conv1 = CircularConv(self.out_channels, 1, 1, 0, circular=False,
                             dtype=self.dtype, name="mlp_0")
        conv2 = CircularConv(self.out_channels, 1, 1, 0, circular=False,
                             dtype=self.dtype, name="mlp_2")
        outs = []
        for shift_h in (-1, 0, 1):          # beams
            for shift_w in (-1, 0, 1):      # azimuth
                x_s = jnp.roll(x, (shift_h, shift_w), axis=(1, 2))
                r_s = jnp.roll(r, (shift_h, shift_w), axis=(1, 2))
                ca = math.cos(shift_w * self.azi)
                sa = math.sin(shift_w * self.azi)
                ci = math.cos(shift_h * self.inc)
                si = math.sin(shift_h * self.inc)
                pe0 = r_s * (ca * ci) - r
                pe1 = r_s * (ca * si)
                pe2 = r_s * sa
                feat = jnp.concatenate([x_s, x, pe0, pe1, pe2], axis=-1)
                h = conv1(feat)
                h = nonlinearity(h, self.act)
                outs.append(conv2(h))
        return jnp.max(jnp.stack(outs), axis=0)


class EdgeConvResnetBlock(nn.Module):
    """model.py:234-299."""
    out_channels: int
    azi: float
    inc: float
    dropout: float = 0.0
    act: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, r, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = GroupNorm(name="norm1", dtype=self.dtype)(x)
        h = nonlinearity(h, self.act)
        h = EdgeConv(self.out_channels, self.azi, self.inc, self.act,
                     self.dtype, name="conv1")(h, r)
        h = GroupNorm(name="norm2", dtype=self.dtype)(h)
        h = nonlinearity(h, self.act)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = EdgeConv(self.out_channels, self.azi, self.inc, self.act,
                     self.dtype, name="conv2")(h, r)
        if in_ch != self.out_channels:
            x = CircularConv(self.out_channels, 1, 1, 0, circular=False,
                             dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


def range_downsample(x: jnp.ndarray, r: jnp.ndarray):
    """Variance-min 2x2 pooling (model.py:127-148): within each 2x2 block
    keep the element whose range is closest to the block mean."""
    b, h, w, c = x.shape
    xb = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4, c)
    rb = r.reshape(b, h // 2, 2, w // 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
    rb = rb.reshape(b, h // 2, w // 2, 4)
    mean = jnp.mean(rb, axis=-1, keepdims=True)
    idx = jnp.argmin((rb - mean) ** 2, axis=-1)
    r_out = jnp.take_along_axis(rb, idx[..., None], axis=-1)
    x_out = jnp.take_along_axis(xb, idx[..., None, None], axis=-2)[..., 0, :]
    return x_out, r_out


class PerRowConv(nn.Module):
    """Exploratory per-beam-row conv: each of the H beam rows gets its own
    (k x k) 2D filter over a circular-azimuth neighbourhood. This is NOT
    the reference's SlicedConv (pair-grouped 1D azimuth filters — see
    models/sliced.py for the torch-parity implementation); it exists as a
    strictly-more-expressive variant for experimentation."""
    out_channels: int
    kernel_size: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        pad = k // 2
        # (H, kh, kw, C, O): an independent 2D filter per output row
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h, k, k, c, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (h, self.out_channels))
        from rangeldm_tpu.models.layers import wrap_pad_azimuth
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        xp = wrap_pad_azimuth(xp, pad, pad)
        # gather (kh, kw) neighbourhoods: (B, H, W, kh, kw, C)
        rows = [jnp.stack([xp[:, i:i + h, j:j + w] for j in range(k)], axis=3)
                for i in range(k)]
        windows = jnp.stack(rows, axis=3)
        y = jnp.einsum("bhwijc,hijco->bhwo", windows, kernel)
        return y + bias[None, :, None, :]


class SparseRangeImageEncoder(nn.Module):
    """Learned condition encoder (ldm/encoders.py:58-84): two stride-(2 azi)
    circular convs. In our layout the torch stride (2, 1) on (W, H) is
    strides (1, 2) on (beams, azimuth)."""
    outdim: int = 4
    middle: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch pads: circular (0,1) on azimuth, constant (1,1) on beams
        x = CircularConv(self.middle, 3, (1, 2), ((1, 1), (0, 1)),
                         circular=True, dtype=self.dtype, name="conv1")(x)
        x = jax.nn.silu(x)
        x = CircularConv(self.outdim, 3, (1, 2), ((1, 1), (0, 1)),
                         circular=True, dtype=self.dtype, name="conv2")(x)
        return x
