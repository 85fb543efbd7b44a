"""Persistent XLA compilation cache setup.

Compilation over the axon TPU tunnel is slow (minutes for a UNet); the
persistent cache makes every subsequent process start instant. Call
`enable_compilation_cache()` before the first jit in any entry point.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "RANGELDM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def honor_jax_platforms_env() -> None:
    """Re-apply the JAX_PLATFORMS env var over any config-level pin.

    Some sandboxes pin `jax_platforms` via config (e.g. 'axon,cpu'), which
    silently overrides the env var — a CLI run with JAX_PLATFORMS=cpu would
    otherwise land on the accelerator. Must run before the backend
    initializes (call first thing in every CLI main())."""
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def enable_compilation_cache(cache_dir: str = DEFAULT_DIR) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax `init` eagerly on the host CPU backend (fast, avoids
    per-op dispatch over the TPU tunnel), returning host arrays.

    All array arguments (including PRNGKeys) are moved to CPU first —
    eager ops follow their operands' device, so a TPU-resident key would
    silently drag the whole init onto the accelerator one op at a time.
    """
    cpu = jax.devices("cpu")[0]

    def to_cpu(x):
        if isinstance(x, jax.Array):
            return jax.device_put(x, cpu)
        return x

    args = jax.tree.map(to_cpu, args)
    kwargs = jax.tree.map(to_cpu, kwargs)
    with jax.default_device(cpu):
        return init_fn(*args, **kwargs)


def cached_init(init_fn, cache_key: str, *args,
                cache_dir: str = DEFAULT_DIR, **kwargs):
    """init_on_cpu with a flat-npz disk cache keyed by `cache_key` (e.g. a
    config repr + seed). Eager CPU init of a big model costs minutes per
    process over this sandbox; parameters for a fixed (config, seed) are
    deterministic, so cache them."""
    import hashlib
    import pickle

    import numpy as np

    digest = hashlib.sha256(cache_key.encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"init-{digest}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                flat, treedef = pickle.load(f)
            return jax.tree.unflatten(treedef, flat)
        except Exception:
            pass
    out = init_on_cpu(init_fn, *args, **kwargs)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        flat, treedef = jax.tree.flatten(out)
        flat = [np.asarray(x) for x in flat]
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((flat, treedef), f)
        os.replace(tmp, path)
    except Exception:
        pass
    return out
