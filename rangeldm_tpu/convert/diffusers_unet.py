"""diffusers UNet2DModel safetensors -> UNet2D params.

The released RangeLDM pipeline directories ship
`unet/diffusion_pytorch_model.safetensors` (+ config.json); our UNet2D's
param names mirror the diffusers keys modulo '.'->'_' nesting
(models/unet.py docstring), so conversion is a rename + per-leaf transpose.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Tuple

import numpy as np

from rangeldm_tpu.convert.torch_common import (
    assign, load_torch_state_dict, t2j_conv, t2j_linear,
)
from rangeldm_tpu.models.unet import UNetConfig

def _module_path(key: str) -> str:
    key = re.sub(r"(down_blocks|up_blocks)\.(\d+)", r"\1_\2", key)
    key = re.sub(r"(resnets|attentions)\.(\d+)", r"\1_\2", key)
    key = re.sub(r"(downsamplers|upsamplers)\.0", r"\1_0", key)
    key = key.replace("to_out.0", "to_out_0")
    key = key.replace("time_embedding.linear_1", "time_embedding_linear_1")
    key = key.replace("time_embedding.linear_2", "time_embedding_linear_2")
    return key.replace(".", "/")


def convert_diffusers_unet_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {}
    for key, val in sd.items():
        base, leaf = key.rsplit(".", 1)
        path = _module_path(base)
        if leaf == "weight":
            if val.ndim == 4:
                assign(params, path + "/kernel", t2j_conv(val))
            elif val.ndim == 2:
                assign(params, path + "/kernel", t2j_linear(val))
            elif val.ndim == 1:          # GroupNorm
                assign(params, path + "/scale", val)
            else:
                raise ValueError(f"unexpected rank for {key}: {val.shape}")
        elif leaf == "bias":
            assign(params, path + "/bias", val)
        else:
            raise ValueError(f"unexpected leaf {key}")
    return params


def load_diffusers_unet(model_dir: str) -> Tuple[Dict, UNetConfig]:
    """Load a diffusers model directory (config.json + safetensors)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    unet_cfg = UNetConfig.from_reference({
        "sample_size": cfg["sample_size"],
        "in_channels": cfg["in_channels"],
        "out_channels": cfg["out_channels"],
        "layers_per_block": cfg.get("layers_per_block", 2),
        "block_out_channels": cfg["block_out_channels"],
        "down_block_types": cfg["down_block_types"],
        "up_block_types": cfg["up_block_types"],
        "attention_head_dim": cfg.get("attention_head_dim") or 8,
    })
    weights = os.path.join(model_dir, "diffusion_pytorch_model.safetensors")
    if not os.path.exists(weights):
        weights = os.path.join(model_dir, "diffusion_pytorch_model.bin")
    sd = load_torch_state_dict(weights)
    return {"params": convert_diffusers_unet_state_dict(sd)}, unet_cfg
