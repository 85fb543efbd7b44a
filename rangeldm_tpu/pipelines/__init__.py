from rangeldm_tpu.pipelines.samplers import (  # noqa: F401
    ddim_sample, ddpm_sample, denoise, latent_sample,
    conditional_latent_sample, make_pos_encoding,
)
from rangeldm_tpu.pipelines.api import RangePipeline  # noqa: F401
