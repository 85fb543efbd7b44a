"""RangeLDM-TPU: a TPU-native LiDAR range-image generative framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WoodwindHu/RangeLDM
(ECCV 2024, arXiv:2403.10094): range-image VAEs, pixel-space and latent
diffusion models for LiDAR point-cloud generation, conditional densification /
inpainting, and the full evaluation suite (MMD / JSD / FRD / MAE / IoU).

Design notes (TPU-first, not a port):
  * Canonical tensor layout is NHWC = (batch, beams, azimuth, channels);
    the azimuth axis is circular and every conv wraps it natively.
  * Denoising loops are `lax.scan`s inside a single jitted program.
  * Distribution is a `jax.sharding.Mesh` + NamedSharding; gradients reduce
    over ICI via XLA collectives.
"""

__version__ = "0.1.0"

from rangeldm_tpu.utils.config import load_config  # noqa: F401
