"""EMA of parameters as pure pytree transforms.

Two decay laws, matching the two reference EMAs:
  * `power_decay` — diffusers EMAModel with use_ema_warmup
    (ldm/train_unconditional.py:320-329):
    decay(step) = clip(1 - (1 + step/inv_gamma)^-power, min, max), where
    `step` is optimization_step - 1 (diffusers get_decay subtracts 1, so
    the FIRST update has decay 0 — EMA starts as a copy of the params,
    not a blend with the random init); used by the LDM trainers
    (inv_gamma=1, power=0.75, max 0.9999). Callers pass the
    pre-increment step counter for exactly this reason.
  * `warmup_decay` — sgm LitEma (vae/sgm/modules/ema.py:33-54):
    decay(n) = min(decay, (1 + n) / (10 + n)); used by the VAE trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def power_decay(step: jnp.ndarray, inv_gamma: float = 1.0,
                power: float = 0.75, min_decay: float = 0.0,
                max_decay: float = 0.9999) -> jnp.ndarray:
    """diffusers EMAModel.get_decay; pass optimization_step - 1 (their
    own convention: step 0 -> decay 0.0 -> first update copies params)."""
    step = jnp.maximum(step.astype(jnp.float32), 0.0)
    value = 1.0 - (1.0 + step / inv_gamma) ** -power
    return jnp.clip(value, min_decay, max_decay)


def warmup_decay(num_updates: jnp.ndarray, decay: float = 0.9999) -> jnp.ndarray:
    """LitEma warmup: min(decay, (1+n)/(10+n))."""
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + n) / (10.0 + n))


def ema_update(ema_params: Any, params: Any, decay: jnp.ndarray) -> Any:
    """shadow <- shadow - (1-decay) * (shadow - param)."""
    one_minus = 1.0 - decay
    return jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)),
        ema_params, params)
