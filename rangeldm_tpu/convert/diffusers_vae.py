"""diffusers AutoencoderKL state dict -> our AutoencoderKL params.

The released RangeLDM pipeline directories store the VAE in diffusers
layout (the output of ldm/convert_vae.py's sgm->diffusers conversion), so
loading them needs this mapping — the composition of the reference's key
remap (convert_ldm_vae_checkpoint, ldm/convert_vae.py:14-121) with ours:

  encoder.down_blocks.{i}.resnets.{j}.*        -> encoder/down_{i}_block_{j}
  encoder.down_blocks.{i}.downsamplers.0.conv  -> encoder/down_{i}_downsample/conv
  encoder.mid_block.resnets.{0,1}              -> encoder/mid_block_{1,2}
  encoder.mid_block.attentions.0.{to_q,...}    -> encoder/mid_attn_1/{q,...}
     (diffusers stores attention projections as Linear after
      conv_attn_to_linear; ours are 1x1 convs -> reshape (O, I) to
      (1, 1, I, O))
  encoder.conv_norm_out                        -> encoder/norm_out
  decoder.up_blocks.{i}                        -> decoder/up_{n-1-i}  (order
     reversed, convert_vae.py:89-105)
  resnets' conv_shortcut                       -> nin_shortcut (1x1)
  quant_conv/post_quant_conv                   -> optional (the released
     RangeLDM VAEs have none, ldm/inference.py:90-92)
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from rangeldm_tpu.convert.torch_common import (
    assign, load_torch_state_dict, t2j_conv,
)

_ATTN_MAP = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "proj_out",
             "query": "q", "key": "k", "value": "v", "proj_attn": "proj_out"}


def _n_up_blocks(sd: Dict[str, np.ndarray]) -> int:
    ids = {int(m.group(1)) for k in sd
           if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))}
    return max(ids) + 1 if ids else 0


def convert_diffusers_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {}
    n_up = _n_up_blocks(sd)
    for key, val in sd.items():
        if "quant_conv" in key:
            continue
        base, leaf = key.rsplit(".", 1)
        if leaf not in ("weight", "bias"):
            continue

        path = base
        path = re.sub(r"down_blocks\.(\d+)\.resnets\.(\d+)",
                      r"down_\1_block_\2", path)
        path = re.sub(r"down_blocks\.(\d+)\.downsamplers\.0",
                      r"down_\1_downsample", path)
        m = re.search(r"up_blocks\.(\d+)", path)
        if m:
            rev = n_up - 1 - int(m.group(1))
            path = re.sub(r"up_blocks\.(\d+)\.resnets\.(\d+)",
                          rf"up_{rev}_block_\2", path)
            path = re.sub(r"up_blocks\.(\d+)\.upsamplers\.0",
                          rf"up_{rev}_upsample", path)
        path = path.replace("mid_block.resnets.0", "mid_block_1")
        path = path.replace("mid_block.resnets.1", "mid_block_2")
        path = path.replace("mid_block.attentions.0", "mid_attn_1")
        path = path.replace("conv_norm_out", "norm_out")
        path = path.replace("conv_shortcut", "nin_shortcut")
        for old, new in _ATTN_MAP.items():
            path = path.replace(f"mid_attn_1.{old}", f"mid_attn_1.{new}")
        path = path.replace("group_norm", "norm")
        path = path.replace(".", "/")

        if leaf == "weight":
            if val.ndim == 4:
                assign(params, path + "/kernel", t2j_conv(val))
            elif val.ndim == 2:
                # linear attention projection -> our 1x1 conv (1, 1, I, O)
                assign(params, path + "/kernel",
                       np.ascontiguousarray(val.T)[None, None])
            elif val.ndim == 1:
                assign(params, path + "/scale", val)
            else:
                raise ValueError(f"unexpected rank for {key}")
        else:
            assign(params, path + "/bias", val)
    return params


def load_diffusers_vae(path: str) -> Dict:
    """Load a diffusers vae/ dir or a single safetensors/bin file."""
    import os
    if os.path.isdir(path):
        for name in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
    return {"params": convert_diffusers_vae_state_dict(
        load_torch_state_dict(path))}
