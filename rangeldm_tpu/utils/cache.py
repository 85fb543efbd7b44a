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
