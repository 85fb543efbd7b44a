"""Condition builders for the conditional LDMs (T2/E11/M12).

ldm/train_conditional.py:418-447:
  * upsample: cond = SparseRangeImageEncoder2(batch['down']) — parameter-free
    azimuth pixel-unshuffle of the beam-subsampled image to latent width.
  * inpainting: cond = cat(vae.encode(masked_image).sample() * sf,
    nearest-resize(inpainting_mask -> latent hw)).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from rangeldm_tpu.models.layers import pixel_unshuffle_azimuth
from rangeldm_tpu.models.vae import gaussian_sample


def make_upsample_cond_fn(factor: int = 4) -> Callable:
    def cond_fn(batch, rng):
        return pixel_unshuffle_azimuth(batch["down"], factor)
    return cond_fn


def make_inpainting_cond_fn(vae, vae_params: Any, scaling_factor: float,
                            latent_hw) -> Callable:
    lh, lw = latent_hw

    def cond_fn(batch, rng):
        moments = vae.apply(vae_params, batch["masked_image"],
                            method="encode_moments")
        z = gaussian_sample(rng, moments) * scaling_factor
        mask = batch["inpainting_mask"]
        mask = jax.image.resize(mask, (mask.shape[0], lh, lw, mask.shape[-1]),
                                method="nearest")
        return jnp.concatenate([z, mask.astype(z.dtype)], axis=-1)
    return cond_fn


def encode_masked_image_cond(vae, vae_params, scaling_factor, image, mask,
                             rng):
    """Inference-time variant (LDMUpscalePipelineRange.encode_masked_image,
    ldm/pipelines.py:406-412)."""
    moments = vae.apply(vae_params, image, method="encode_moments")
    z = gaussian_sample(rng, moments) * scaling_factor
    mask = jax.image.resize(mask, (mask.shape[0],) + z.shape[1:3] +
                            (mask.shape[-1],), method="nearest")
    return jnp.concatenate([z, mask.astype(z.dtype)], axis=-1)
