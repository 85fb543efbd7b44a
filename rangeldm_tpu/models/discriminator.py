"""PatchGAN discriminators for the VAE GAN loss.

Re-implements NLayerDiscriminator and the range-aware MetaKernel variants
(vae/sgm/modules/autoencoding/lpips/model/model.py:18-373) in NHWC.

MetaKernel: per-patch MLP over range-derived relative-xyz positional
encodings modulates a 4x4 unfolded conv, padded circular on azimuth /
constant-100 on beams (model.py:128-153). Patch extraction is done with k*k
strided slices, which XLA fuses; no unfold materialization.

Default angular steps azi=2*pi/1024, inc from the KITTI beam spacing
(model.py:174-180 defaults azi=0.00613592, inc=0.0074594).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rangeldm_tpu.models.layers import CircularConv, wrap_pad_azimuth

Dtype = Any
_normal_init = nn.initializers.normal(0.02)  # weights_init (model.py:9-15)

def _bn_scale_init(key, shape, dtype=jnp.float32):
    """weights_init for BatchNorm: N(1.0, 0.02) (model.py:13-15)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)



def leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _extract_patches(x: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    """(B, Hp, Wp, C) padded input -> (B, Ho, Wo, k, k, C) windows;
    patch index [ib, ia] = (beam offset, azimuth offset)."""
    b, hp, wp, c = x.shape
    ho = (hp - k) // stride + 1
    wo = (wp - k) // stride + 1
    rows = []
    for ib in range(k):
        cols = []
        for ia in range(k):
            cols.append(jax.lax.slice(
                x, (0, ib, ia, 0), (b, ib + stride * (ho - 1) + 1,
                                    ia + stride * (wo - 1) + 1, c),
                (1, stride, stride, 1)))
        rows.append(jnp.stack(cols, axis=3))
    return jnp.stack(rows, axis=3)          # (B, Ho, Wo, kb, ka, C)


class MetaKernel(nn.Module):
    """Range-conditioned 4x4 'conv': MLP(relative xyz) * patches -> 1x1 conv.

    __call__(x (B,H,W,C), r (B,H,W,1)) -> (y, r_center).
    """
    out_channels: int
    azi: float
    inc: float
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, r: jnp.ndarray):
        k, s, p = self.kernel_size, self.stride, self.padding
        c = x.shape[-1]

        # angular offsets of each in-patch position relative to patch origin
        offs = np.arange(k) - k // 2
        cos_azi = np.cos(self.azi * offs)[None, :]   # (1, ka)
        sin_azi = np.sin(self.azi * offs)[None, :]
        cos_inc = np.cos(self.inc * offs)[:, None]   # (kb, 1)
        sin_inc = np.sin(self.inc * offs)[:, None]

        def pad(v, fill):
            v = jnp.pad(v, ((0, 0), (p, p), (0, 0), (0, 0)),
                        constant_values=fill)       # beams: constant
            return wrap_pad_azimuth(v, p, p)        # azimuth: circular

        r_pat = _extract_patches(pad(r, 100.0), k, s)[..., 0]  # (B,Ho,Wo,kb,ka)
        r_center = r_pat[..., k // 2, k // 2]

        az_cos = jnp.asarray(cos_azi, r.dtype)
        az_sin = jnp.asarray(sin_azi, r.dtype)
        in_cos = jnp.asarray(cos_inc, r.dtype)
        in_sin = jnp.asarray(sin_inc, r.dtype)
        pe0 = r_pat * az_cos * in_cos - r_center[..., None, None]
        pe1 = r_pat * az_cos * in_sin
        pe2 = r_pat * az_sin
        pe = jnp.stack([pe0, pe1, pe2], axis=-1)     # (B,Ho,Wo,kb,ka,3)

        w = nn.Dense(c, dtype=self.dtype, name="mlp_coord_0")(pe)
        w = leaky_relu(w)
        w = nn.Dense(c, dtype=self.dtype, name="mlp_coord_2")(w)

        x_pat = _extract_patches(pad(x, 0.0), k, s)  # (B,Ho,Wo,kb,ka,C)
        x_pat = x_pat * w
        b, ho, wo = x_pat.shape[:3]
        # channel order (C, kb, ka) to match the torch reshape
        # (model.py:151): c * k*k + ib * k + ia
        x_flat = x_pat.transpose(0, 1, 2, 5, 3, 4).reshape(b, ho, wo, c * k * k)
        y = CircularConv(self.out_channels, 1, 1, 0, circular=False,
                         dtype=self.dtype, kernel_init=_normal_init,
                         name="coov")(x_flat)
        return y, r_center[..., None]


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN (model.py:18-89): plain zero-padded 4x4 convs +
    BatchNorm + LeakyReLU. `train` toggles batch-stats updates."""
    ndf: int = 64
    n_layers: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def conv(ch, stride, name, use_bias=False):
            return CircularConv(ch, 4, stride, 1, circular=False,
                                use_bias=use_bias, dtype=self.dtype,
                                kernel_init=_normal_init, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                scale_init=_bn_scale_init)

        # n_layers stride-2 k4/p1 stages (H -> (H-2)//2 + 1) followed by TWO
        # k4/s1/p1 stages (H -> H-1 each): too-short inputs collapse to an
        # empty tensor whose mean/BatchNorm is silently NaN. Assert on the
        # exact output extent, not a loose power-of-two bound (a 16-row
        # input passes min>=16 yet still ends empty: 16->8->4->2->1->0).
        def out_extent(s):
            for _ in range(self.n_layers):
                s = (s - 2) // 2 + 1
            return s - 2
        short = min(x.shape[1], x.shape[2])
        assert out_extent(short) >= 1, \
            f"input {x.shape} too small for a {self.n_layers}-layer " \
            f"PatchGAN (final feature extent {out_extent(short)})"
        h = conv(self.ndf, 2, "main_0", use_bias=True)(x)
        h = leaky_relu(h)
        nf, idx = 1, 2
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = conv(self.ndf * nf, 2, f"main_{idx}")(h)
            h = bn(f"main_{idx + 1}")(h)
            h = leaky_relu(h)
            idx += 3
        nf = min(2 ** self.n_layers, 8)
        h = conv(self.ndf * nf, 1, f"main_{idx}")(h)
        h = bn(f"main_{idx + 1}")(h)
        h = leaky_relu(h)
        idx += 3
        return conv(1, 1, f"main_{idx}", use_bias=True)(h)


class NLayerDiscriminatorMetaKernel(nn.Module):
    """MetaKernel PatchGAN (model.py:173-265): every conv replaced by a
    MetaKernel whose angular steps double at each stride-2 stage. The input's
    channel 0 is the normalized range, un-normalized to decameters for the
    positional encodings (model.py:255-264)."""
    ndf: int = 64
    n_layers: int = 3
    azi: float = 0.00613592
    inc: float = 0.0074594
    log_encoding: bool = False
    range_mean: float = 20.0
    range_std: float = 40.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        r = x[..., :1]
        if self.log_encoding:
            r = jnp.clip(r, 0.0, 1.2)
            r = (64.0 ** r - 1.0) / 10.0
        else:
            r = (r * self.range_std + self.range_mean) / 10.0

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                scale_init=_bn_scale_init)

        # fail with a clear message BEFORE a mid-stack stride-2 stage
        # collapses to zero extent — lax.slice inside _extract_patches
        # would otherwise raise an opaque 'limit < start'; the post-hoc
        # assert below only reaches stride-1 collapses (zero-width slices
        # are legal there)
        eh, ew = int(x.shape[1]), int(x.shape[2])
        for _ in range(self.n_layers):
            eh, ew = (eh - 2) // 2 + 1, (ew - 2) // 2 + 1
            if eh <= 0 or ew <= 0:
                raise ValueError(
                    f"input {x.shape} too small for a {self.n_layers}-layer "
                    "MetaKernel discriminator: a stride-2 stage collapses "
                    "to zero spatial extent")
        azi, inc = self.azi, self.inc
        h, r = MetaKernel(self.ndf, azi, inc, stride=2, dtype=self.dtype,
                          name="main_0")(x, r)
        h = leaky_relu(h)
        azi, inc = azi * 2, inc * 2
        nf, idx = 1, 2
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h, r = MetaKernel(self.ndf * nf, azi, inc, stride=2,
                              dtype=self.dtype, name=f"main_{idx}")(h, r)
            h = bn(f"main_{idx + 1}")(h)
            h = leaky_relu(h)
            azi, inc = azi * 2, inc * 2
            idx += 3
        nf = min(2 ** self.n_layers, 8)
        h, r = MetaKernel(self.ndf * nf, azi, inc, stride=1,
                          dtype=self.dtype, name=f"main_{idx}")(h, r)
        h = bn(f"main_{idx + 1}")(h)
        h = leaky_relu(h)
        idx += 3
        y, _ = MetaKernel(1, azi, inc, stride=1, dtype=self.dtype,
                          name=f"main_{idx}")(h, r)
        assert y.shape[1] > 0 and y.shape[2] > 0, (
            f"input {x.shape} too small for a {self.n_layers}-layer "
            "MetaKernel discriminator (logits collapsed to zero size)")
        return y


class NLayerDiscriminatorMetaKernel2(nn.Module):
    """Hybrid variant 2 (model.py:268-373): two MetaKernel stages up front,
    plain zero-padded 4x4 convs for the rest. The KITTI config uses
    variant 1; this exists for the `metakernel: 2` config path."""
    ndf: int = 64
    n_layers: int = 3
    azi: float = 0.00613592
    inc: float = 0.0074594
    log_encoding: bool = False
    range_mean: float = 20.0
    range_std: float = 40.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        r = x[..., :1]
        if self.log_encoding:
            r = jnp.clip(r, 0.0, 1.2)
            r = (64.0 ** r - 1.0) / 10.0
        else:
            r = (r * self.range_std + self.range_mean) / 10.0

        def conv(ch, stride, name, use_bias=False):
            return CircularConv(ch, 4, stride, 1, circular=False,
                                use_bias=use_bias, dtype=self.dtype,
                                kernel_init=_normal_init, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name,
                                scale_init=_bn_scale_init)

        azi, inc = self.azi, self.inc
        h, r = MetaKernel(self.ndf, azi, inc, stride=2, dtype=self.dtype,
                          name="main_0")(x, r)
        h = leaky_relu(h)
        azi, inc = azi * 2, inc * 2
        h, r = MetaKernel(self.ndf * 2, azi, inc, stride=2, dtype=self.dtype,
                          name="main_2")(h, r)
        h = bn("main_3")(h)
        h = leaky_relu(h)
        nf, idx = 2, 5
        for n in range(2, self.n_layers):
            nf = min(2 ** n, 8)
            h = conv(self.ndf * nf, 2, f"main_{idx}")(h)
            h = bn(f"main_{idx + 1}")(h)
            h = leaky_relu(h)
            idx += 3
        nf = min(2 ** self.n_layers, 8)
        h = conv(self.ndf * nf, 1, f"main_{idx}")(h)
        h = bn(f"main_{idx + 1}")(h)
        h = leaky_relu(h)
        idx += 3
        return conv(1, 1, f"main_{idx}", use_bias=True)(h)
