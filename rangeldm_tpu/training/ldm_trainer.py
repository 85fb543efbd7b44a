"""Latent/pixel diffusion training step (T1/T2 equivalents).

The per-batch hot path of ldm/train_unconditional.py:466-556 as one pure
function jitted over the data-parallel mesh:
  frozen-VAE encode -> scale -> sample noise/timesteps -> add_noise ->
  concat pos-encoding / condition -> UNet -> (min-SNR weighted) MSE ->
  clipped AdamW update -> EMA.
Gradient reduction over devices is the XLA all-reduce the compiler inserts
for the batch-sharded loss mean; no hand-written collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from rangeldm_tpu.diffusion.schedule import Schedule
from rangeldm_tpu.models.vae import gaussian_sample
from rangeldm_tpu.pipelines.samplers import make_pos_encoding
from rangeldm_tpu.training.ema import ema_update, power_decay
from rangeldm_tpu.training.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class LdmTrainConfig:
    pos_encoding: bool = True
    scaling_factor: float = 0.18215     # vae.config.scaling_factor
    shifting_factor: float = 0.0        # pixel-space option (train_unconditional.py:483-485)
    pixel_scaling: Optional[float] = None  # args.scaling_factor for RangeDM
    snr_gamma: Optional[float] = None
    ema_inv_gamma: float = 1.0
    ema_power: float = 0.75
    ema_max_decay: float = 0.9999
    grad_accum_steps: int = 1


def make_ldm_train_step(unet_apply: Callable,
                        schedule: Schedule,
                        tx: optax.GradientTransformation,
                        cfg: LdmTrainConfig,
                        vae_apply: Optional[Callable] = None,
                        vae_params: Optional[Any] = None,
                        cond_fn: Optional[Callable] = None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: (B, H, W, C) range images (already normalized), or a dict with
    'jpg' plus condition inputs. If `vae_apply` is given it must be
    `vae.apply({'params': p}, x, method='encode_moments')` -> moments; the
    VAE stays frozen (latents are stop-gradient by construction since
    vae_params are not differentiated). `cond_fn(batch_dict, rng) -> cond`
    builds per-step conditioning channels concatenated to the noisy input
    (ldm/train_conditional.py:418-447).
    """
    prediction_type = schedule.cfg.prediction_type

    def loss_fn(params, latents, cond, rng):
        b = latents.shape[0]
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
        t = jax.random.randint(rng_t, (b,), 0, schedule.cfg.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)

        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = schedule.get_velocity(latents, noise, t)
        else:
            raise ValueError(prediction_type)

        inp = noisy
        if cond is not None:
            inp = jnp.concatenate([inp, cond.astype(inp.dtype)], axis=-1)
        if cfg.pos_encoding:
            pos = make_pos_encoding(b, latents.shape[1], latents.shape[2],
                                    latents.dtype)
            inp = jnp.concatenate([inp, pos], axis=-1)

        pred = unet_apply(params, inp, t)
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if cfg.snr_gamma is not None:
            w = schedule.min_snr_weight(t, cfg.snr_gamma,
                                        velocity=prediction_type == "v_prediction")
            loss = jnp.mean(jnp.mean(err, axis=(1, 2, 3)) * w)
        else:
            loss = jnp.mean(err)
        return loss

    def encode(batch, rng):
        if vae_apply is not None:
            moments = vae_apply(vae_params, batch)
            latents = gaussian_sample(rng, moments) * cfg.scaling_factor
        else:
            latents = (batch - cfg.shifting_factor)
            if cfg.pixel_scaling is not None:
                latents = latents * cfg.pixel_scaling
        return latents

    def apply_updates_and_ema(state: TrainState, grads, loss):
        """Shared epilogue of both train-step variants: optimizer update +
        EMA + step increment. EMA decay follows the diffusers convention
        (get_decay uses optimization_step - 1 == the PRE-increment
        counter, so the first update copies the params into the shadow
        instead of blending with the random init)."""
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            decay = power_decay(state.step, cfg.ema_inv_gamma, cfg.ema_power,
                                max_decay=cfg.ema_max_decay)
            ema_params = ema_update(ema_params, params, decay)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema_params=ema_params)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    def train_step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_vae, rng_cond, rng_loss = jax.random.split(rng, 3)
        if isinstance(batch, dict) and "moments" in batch:
            # precomputed frozen-VAE posterior moments (latent cache,
            # training/latent_cache.py); the per-step posterior draw keeps
            # the reference's latent_dist.sample() stochasticity
            latents = (gaussian_sample(rng_vae, batch["moments"])
                       * cfg.scaling_factor)
        else:
            images = batch["jpg"] if isinstance(batch, dict) else batch
            latents = encode(images, rng_vae)
        cond = cond_fn(batch, rng_cond) if cond_fn is not None else None
        loss, grads = jax.value_and_grad(loss_fn)(state.params, latents, cond,
                                                  rng_loss)
        return apply_updates_and_ema(state, grads, loss)

    if cfg.grad_accum_steps > 1:
        def train_step(state, batch, rng):  # noqa: F811
            """Microbatch accumulation via lax.scan (the reference's
            accelerate.accumulate, ldm/train_unconditional.py:503)."""
            k = cfg.grad_accum_steps
            rng = jax.random.fold_in(rng, state.step)
            rng_vae, rng_cond, rng_loss = jax.random.split(rng, 3)
            if isinstance(batch, dict) and "moments" in batch:
                b = batch["moments"].shape[0]
                latents = (gaussian_sample(rng_vae, batch["moments"])
                           * cfg.scaling_factor)
            else:
                images = batch["jpg"] if isinstance(batch, dict) else batch
                b = images.shape[0]
                latents = encode(images, rng_vae)
            latents = latents.reshape((k, b // k) + latents.shape[1:])
            cond = cond_fn(batch, rng_cond) if cond_fn is not None else None
            if cond is not None:
                cond = cond.reshape((k, b // k) + cond.shape[1:])
            else:
                cond = jnp.zeros((k,), jnp.float32)  # scan placeholder

            def body(acc, xs):
                lat, cd, r = xs
                cd = cd if cond_fn is not None else None
                loss, grads = jax.value_and_grad(loss_fn)(state.params, lat,
                                                          cd, r)
                acc_g, acc_l = acc
                return (jax.tree.map(jnp.add, acc_g, grads), acc_l + loss), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(rng_loss, k)
            (grads, loss), _ = jax.lax.scan(body, (zero, 0.0),
                                            (latents, cond, keys))
            grads = jax.tree.map(lambda g: g / k, grads)
            loss = loss / k
            return apply_updates_and_ema(state, grads, loss)

    return train_step
