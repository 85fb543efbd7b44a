"""Range-image KL autoencoder (VAE) in the sgm grammar.

Re-implements the reference Encoder/Decoder
(vae/sgm/modules/diffusionmodules/model.py:707-1057) and
`DiagonalGaussianDistribution` (vae/sgm/modules/distributions/
distributions.py:24-72) as flax modules over NHWC (beams, azimuth) with
first-class circular convs. Parameter names mirror the sgm state_dict keys
(down_{i}_block_{j}, mid_block_1, norm_out, ...) so the torch checkpoint
importer is a mechanical rename (see convert/sgm_vae.py).

Shipped KITTI-360 config (vae/configs/kitti360.yaml): ch=64, ch_mult=[1,2,4],
num_res_blocks=2, z_channels=4, double_z, attention-free, silu, circular.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rangeldm_tpu.models.layers import (
    CircularConv, GroupNorm, VaeAttnBlock, VaeDownsample, VaeResnetBlock,
    VaeUpsample, nonlinearity,
)


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    in_channels: int = 2
    out_ch: int = 2
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    attn_type: str = "none"          # 'none' | 'vanilla'
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256            # attn-resolution counter seed only
    dropout: float = 0.0
    act: str = "silu"
    circular: bool = True
    coord: bool = False
    scaling_factor: float = 0.18215  # diffusers default (ldm/convert_vae.py:166)
    use_quant_conv: bool = False     # sgm engine has none (ldm/inference.py:90-92)

    @property
    def down_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


class Encoder(nn.Module):
    """sgm Encoder (model.py:707-896), attention optional."""
    cfg: VaeConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        kw = dict(act=c.act, circular=c.circular, coord=c.coord,
                  dropout=c.dropout, dtype=self.dtype)
        h = CircularConv(c.ch, 3, 1, 1, circular=c.circular, coord=c.coord,
                         dtype=self.dtype, name="conv_in")(x)
        curr_res = c.resolution
        n_levels = len(c.ch_mult)
        for i, mult in enumerate(c.ch_mult):
            block_out = c.ch * mult
            for j in range(c.num_res_blocks):
                h = VaeResnetBlock(block_out, name=f"down_{i}_block_{j}",
                                   **kw)(h, deterministic)
                if curr_res in c.attn_resolutions and c.attn_type != "none":
                    h = VaeAttnBlock(dtype=self.dtype,
                                     name=f"down_{i}_attn_{j}")(h)
            if i != n_levels - 1:
                h = VaeDownsample(circular=c.circular, coord=c.coord,
                                  dtype=self.dtype,
                                  name=f"down_{i}_downsample")(h)
                curr_res //= 2

        h = VaeResnetBlock(h.shape[-1], name="mid_block_1", **kw)(h, deterministic)
        if c.attn_type != "none":
            h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VaeResnetBlock(h.shape[-1], name="mid_block_2", **kw)(h, deterministic)

        h = GroupNorm(name="norm_out", dtype=self.dtype)(h)
        h = nonlinearity(h, c.act)
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        return CircularConv(out_ch, 3, 1, 1, circular=c.circular, coord=c.coord,
                            dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """sgm Decoder (model.py:899-1057): num_res_blocks+1 blocks per level,
    nearest-2x upsampling between levels."""
    cfg: VaeConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True,
                 pre_end: bool = False) -> jnp.ndarray:
        """pre_end=True returns the activations FEEDING conv_out (after
        norm_out + act) — the input of the adaptive-GAN-weight layer
        (losses/__init__.py:200-215 differentiates w.r.t. conv_out.weight
        only, so its gradients need just these features; the reference's
        Decoder has the analogous give_pre_end, model.py:915)."""
        c = self.cfg
        kw = dict(act=c.act, circular=c.circular, coord=c.coord,
                  dropout=c.dropout, dtype=self.dtype)
        n_levels = len(c.ch_mult)
        block_in = c.ch * c.ch_mult[-1]
        curr_res = c.resolution // 2 ** (n_levels - 1)

        h = CircularConv(block_in, 3, 1, 1, circular=c.circular, coord=c.coord,
                         dtype=self.dtype, name="conv_in")(z)
        h = VaeResnetBlock(block_in, name="mid_block_1", **kw)(h, deterministic)
        if c.attn_type != "none":
            h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VaeResnetBlock(block_in, name="mid_block_2", **kw)(h, deterministic)

        for i in reversed(range(n_levels)):
            block_out = c.ch * c.ch_mult[i]
            for j in range(c.num_res_blocks + 1):
                h = VaeResnetBlock(block_out, name=f"up_{i}_block_{j}",
                                   **kw)(h, deterministic)
                if curr_res in c.attn_resolutions and c.attn_type != "none":
                    h = VaeAttnBlock(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = VaeUpsample(circular=c.circular, coord=c.coord,
                                dtype=self.dtype, name=f"up_{i}_upsample")(h)
                curr_res *= 2

        h = GroupNorm(name="norm_out", dtype=self.dtype)(h)
        h = nonlinearity(h, c.act)
        if pre_end:
            return h
        return CircularConv(c.out_ch, 3, 1, 1, circular=c.circular,
                            coord=c.coord, dtype=self.dtype, name="conv_out")(h)


# ---------------------------------------------------------------------------
# Diagonal Gaussian posterior (pure functions; distributions.py:24-72)
# ---------------------------------------------------------------------------

def gaussian_params(moments: jnp.ndarray):
    """Split encoder moments (…, 2Z) into (mean, logvar) with the reference's
    [-30, 20] clamp."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def gaussian_sample(rng: jax.Array, moments: jnp.ndarray) -> jnp.ndarray:
    mean, logvar = gaussian_params(moments)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_mode(moments: jnp.ndarray) -> jnp.ndarray:
    return gaussian_params(moments)[0]


def gaussian_kl(moments: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, 1)) summed over non-batch dims (distributions.py:43-51)."""
    mean, logvar = gaussian_params(moments)
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(mean ** 2 + var - 1.0 - logvar,
                         axis=tuple(range(1, mean.ndim)))


class AutoencoderKL(nn.Module):
    """KL autoencoder: encode -> diagonal-Gaussian posterior -> decode.

    Equivalent of sgm `AutoencodingEngine`/`AutoencoderKL`
    (vae/sgm/models/autoencoder.py:116-403) minus the training harness
    (losses/optimizers live in training/vae_trainer.py).
    """
    cfg: VaeConfig
    dtype: Optional[Any] = None

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        if self.cfg.use_quant_conv:
            self.quant_conv = CircularConv(2 * self.cfg.z_channels, 1, 1, 0,
                                           circular=False, dtype=self.dtype)
            self.post_quant_conv = CircularConv(self.cfg.z_channels, 1, 1, 0,
                                                circular=False, dtype=self.dtype)

    def encode_moments(self, x, deterministic: bool = True):
        m = self.encoder(x, deterministic)
        if self.cfg.use_quant_conv:
            m = self.quant_conv(m)
        return m

    def decode(self, z, deterministic: bool = True):
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def decode_features(self, z, deterministic: bool = True):
        """Decode up to (but not including) conv_out — the pre-last-layer
        activations the adaptive GAN weight differentiates through
        (training/vae_trainer.py; see Decoder.__call__ pre_end)."""
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z, deterministic, pre_end=True)

    def __call__(self, x, rng: Optional[jax.Array] = None,
                 sample_posterior: bool = True, deterministic: bool = True):
        """Returns (reconstruction, z, moments) — the engine's
        (z, xrec, reg_log) triple (autoencoder.py:170-184)."""
        moments = self.encode_moments(x, deterministic)
        if sample_posterior:
            assert rng is not None
            z = gaussian_sample(rng, moments)
        else:
            z = gaussian_mode(moments)
        xrec = self.decode(z, deterministic)
        return xrec, z, moments
