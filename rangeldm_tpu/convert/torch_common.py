"""Shared torch->JAX tensor conversion helpers.

Layout contracts (see models/layers.py docstring):
  conv weight  torch (O, I, k_azi, k_beam) -> HWIO (k_beam, k_azi, I, O)
  linear       torch (O, I)                -> (I, O)
  norm weight  torch (C,)                  -> 'scale'
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def t2j_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 1, 0)))


def t2j_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def to_numpy(t) -> np.ndarray:
    """torch tensor / numpy array -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def assign(tree: Dict, path: str, leaf: np.ndarray) -> None:
    """Set tree['a']['b']['c'] for path 'a/b/c', creating dicts."""
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = leaf


def load_torch_state_dict(path: str):
    """Load a .ckpt/.pt (torch.load) or .safetensors file into a flat
    {key: numpy} dict."""
    if str(path).endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="pt") as f:
            for k in f.keys():
                out[k] = to_numpy(f.get_tensor(k))
        return out
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: to_numpy(v) for k, v in obj.items()}
