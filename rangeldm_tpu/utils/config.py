"""Config system: YAML files -> attribute-accessible nested namespaces.

One coherent replacement for the reference's two conventions (flat OmegaConf
namespace in ldm/*, target/params reflective instantiation in vae/*; see
vae/sgm/util.py:168-185). Configs are plain nested dicts wrapped in `Cfg` for
dot access, with `.get(key, default)` mirroring the reference's
`hasattr(args, ...)` feature gates (ldm/train_unconditional.py:370-389).
"""

from __future__ import annotations

import copy
import importlib
from typing import Any, Mapping

import yaml


class Cfg(dict):
    """dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, Mapping):
            return Cfg({k: Cfg.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(Cfg.wrap(v) for v in obj)
        return obj

    def merged(self, other: Mapping) -> "Cfg":
        """Deep merge: values in `other` win (left-to-right config merging,
        vae/main.py:632-636)."""
        out = copy.deepcopy(dict(self))
        for k, v in other.items():
            if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
                out[k] = Cfg.wrap(out[k]).merged(v)
            else:
                out[k] = copy.deepcopy(v)
        return Cfg.wrap(out)


def load_config(*paths: str, overrides: Mapping | None = None) -> Cfg:
    cfg = Cfg()
    for path in paths:
        with open(path) as f:
            cfg = cfg.merged(yaml.safe_load(f) or {})
    if overrides:
        cfg = cfg.merged(overrides)
    return Cfg.wrap(cfg)


def instantiate(spec: Mapping, **extra_kwargs) -> Any:
    """`{'target': 'pkg.mod.Cls', 'params': {...}}` -> instance
    (the vae/sgm/util.py:168-185 convention, kept for config parity)."""
    target = spec["target"]
    module, cls = target.rsplit(".", 1)
    fn = getattr(importlib.import_module(module), cls)
    kwargs = dict(spec.get("params", {}) or {})
    kwargs.update(extra_kwargs)
    return fn(**kwargs)
