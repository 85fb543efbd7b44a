"""Export our params back to torch-ecosystem formats (interchange parity).

Inverse of convert/diffusers_unet.py and convert/sgm_vae.py: emits flat
state dicts with diffusers/sgm key grammar and torch tensor layouts, saved
as .safetensors, so checkpoints trained here load in the reference stack.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from rangeldm_tpu.convert.torch_common import t2j_conv, t2j_linear

# The layout transposes are involutions: torch->jax and jax->torch are the
# same permutation. One definition (torch_common) avoids drift.
j2t_conv = t2j_conv
j2t_linear = t2j_linear


def _flatten(tree: Dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def export_unet_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Our UNet2D params -> diffusers UNet2DModel flat state dict."""
    out = {}
    for path, leaf in _flatten(params):
        *mods, leaf_name = path
        key = ".".join(mods)
        # undo the '_' nesting renames
        key = key.replace("time_embedding_linear_1", "time_embedding.linear_1")
        key = key.replace("time_embedding_linear_2", "time_embedding.linear_2")
        for pat in ("down_blocks", "up_blocks"):
            key = _renum(key, pat)
        for pat in ("resnets", "attentions"):
            key = _renum(key, pat)
        key = key.replace("downsamplers_0", "downsamplers.0")
        key = key.replace("upsamplers_0", "upsamplers.0")
        key = key.replace("to_out_0", "to_out.0")
        if leaf_name == "kernel":
            if leaf.ndim == 4:
                out[key + ".weight"] = j2t_conv(leaf)
            else:
                out[key + ".weight"] = j2t_linear(leaf)
        elif leaf_name == "scale":
            out[key + ".weight"] = leaf
        elif leaf_name == "bias":
            out[key + ".bias"] = leaf
        else:
            raise ValueError(f"unexpected leaf {path}")
    return out


def _renum(key: str, pat: str) -> str:
    import re
    return re.sub(rf"{pat}_(\d+)", rf"{pat}.\1", key)


def export_vae_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Our AutoencoderKL params -> sgm state dict
    (encoder.down.{i}.block.{j}... grammar)."""
    import re
    out = {}
    for path, leaf in _flatten(params):
        *mods, leaf_name = path
        key = ".".join(mods)
        key = re.sub(r"down_(\d+)_block_(\d+)", r"down.\1.block.\2", key)
        key = re.sub(r"down_(\d+)_downsample", r"down.\1.downsample", key)
        key = re.sub(r"up_(\d+)_block_(\d+)", r"up.\1.block.\2", key)
        key = re.sub(r"up_(\d+)_upsample", r"up.\1.upsample", key)
        key = key.replace("mid_block_1", "mid.block_1")
        key = key.replace("mid_block_2", "mid.block_2")
        key = key.replace("mid_attn_1", "mid.attn_1")
        if leaf_name == "kernel":
            out[key + ".weight"] = j2t_conv(leaf)
        elif leaf_name == "scale":
            out[key + ".weight"] = leaf
        elif leaf_name == "bias":
            out[key + ".bias"] = leaf
        else:
            raise ValueError(f"unexpected leaf {path}")
    return out


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()},
              path)
