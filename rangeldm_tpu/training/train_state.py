"""Train state + optimizer factory shared by the LDM and VAE trainers."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               with_ema: bool = True):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   ema_params=jax.tree.map(jnp.copy, params) if with_ema else None)


def make_adamw(learning_rate=1e-4, warmup_steps: int = 500,
               total_steps: int = 1_000_000, schedule: str = "cosine",
               beta1: float = 0.95, beta2: float = 0.999,
               weight_decay: float = 1e-6, eps: float = 1e-8,
               grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW + clip + LR schedule matching ldm/train_unconditional.py:357-363
    and get_scheduler('cosine', warmup 500) (:394-399)."""
    if schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1),
            end_value=0.0)
    elif schedule == "constant":
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)], [warmup_steps])
    else:
        raise ValueError(schedule)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=beta1, b2=beta2, eps=eps,
                    weight_decay=weight_decay),
    )
