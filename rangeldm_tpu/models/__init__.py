from rangeldm_tpu.models.layers import CircularConv, PixelUnshuffleAzimuth  # noqa: F401
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig  # noqa: F401
from rangeldm_tpu.models.unet import UNet2D, UNetConfig  # noqa: F401
from rangeldm_tpu.models.discriminator import (  # noqa: F401
    NLayerDiscriminator, NLayerDiscriminatorMetaKernel,
)
from rangeldm_tpu.models.zoo import ZOO, ModelSpec, get_model_spec  # noqa: F401
