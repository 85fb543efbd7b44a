"""sgm VAE checkpoint (.ckpt) -> AutoencoderKL params.

The equivalent of ldm/convert_vae.py:14-121 (`convert_ldm_vae_checkpoint`)
targeting our param tree instead of diffusers'. Handles the
`first_stage_model.` prefix, skips the `loss.*` (discriminator) subtree, and
tolerates missing quant convs (the RangeLDM VAEs have none,
ldm/inference.py:90-92).

sgm key grammar (vae/sgm/modules/diffusionmodules/model.py):
  encoder.conv_in | encoder.down.{i}.block.{j}.{norm1,conv1,norm2,conv2,
  nin_shortcut,conv_shortcut} | encoder.down.{i}.downsample.conv |
  encoder.mid.{block_1,attn_1,block_2} | encoder.norm_out | encoder.conv_out
  (decoder mirrors with up.{i} and upsample)

Ours: encoder/down_{i}_block_{j}/... (see models/vae.py).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from rangeldm_tpu.convert.torch_common import (
    assign, load_torch_state_dict, t2j_conv,
)

_ATTN_LEAVES = {"norm", "q", "k", "v", "proj_out"}


def _module_path(key: str) -> str:
    """sgm module path -> our '/'-joined module path."""
    key = re.sub(r"^first_stage_model\.", "", key)
    m = re.match(r"(encoder|decoder)\.(.*)", key)
    if not m:
        raise KeyError(key)
    tower, rest = m.groups()
    rest = rest.replace("mid.block_1", "mid_block_1")
    rest = rest.replace("mid.block_2", "mid_block_2")
    rest = rest.replace("mid.attn_1", "mid_attn_1")
    rest = re.sub(r"down\.(\d+)\.block\.(\d+)", r"down_\1_block_\2", rest)
    rest = re.sub(r"down\.(\d+)\.downsample", r"down_\1_downsample", rest)
    rest = re.sub(r"up\.(\d+)\.block\.(\d+)", r"up_\1_block_\2", rest)
    rest = re.sub(r"up\.(\d+)\.upsample", r"up_\1_upsample", rest)
    return tower + "/" + rest.replace(".", "/")


def convert_sgm_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Flat torch state dict -> nested flax params['params'] tree."""
    params: Dict = {}
    for key, val in sd.items():
        if key.startswith("loss.") or key.startswith("model_ema.") \
                or "quant_conv" in key:
            continue
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        base, leaf = key.rsplit(".", 1)
        path = _module_path(base)
        if leaf == "weight":
            if val.ndim == 4:
                assign(params, path + "/kernel", t2j_conv(val))
            elif val.ndim == 1:          # GroupNorm
                assign(params, path + "/scale", val)
            else:
                raise ValueError(f"unexpected weight rank for {key}: {val.shape}")
        else:
            assign(params, path + "/bias", val)
    return params


def load_sgm_vae(path: str) -> Dict:
    return {"params": convert_sgm_vae_state_dict(load_torch_state_dict(path))}
