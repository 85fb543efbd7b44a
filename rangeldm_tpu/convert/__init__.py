from rangeldm_tpu.convert.sgm_vae import load_sgm_vae  # noqa: F401
from rangeldm_tpu.convert.diffusers_unet import load_diffusers_unet  # noqa: F401
from rangeldm_tpu.convert.diffusers_vae import load_diffusers_vae  # noqa: F401
from rangeldm_tpu.convert.export import (  # noqa: F401
    export_unet_state_dict, export_vae_state_dict, save_safetensors,
)
