"""Sampling pipelines: the whole denoise loop is one `lax.scan` inside one
jitted program — one XLA compilation per (pipeline, shape), zero per-step
Python dispatch (vs 50 dispatches/sample in ldm/pipelines.py:353-362).

Four pipelines mirror the reference API surface:
  * ddpm_sample    — DDPMPipelineRange  (ldm/pipelines.py:14-117)
  * ddim_sample    — DDIMPipelineRange  (:119-258), pos-encoding channel
  * latent_sample  — LDMPipelineRange   (:261-383), VAE decode at the end
  * conditional_latent_sample — LDMUpscalePipelineRange (:386-519)

All functions take a `model_fn(x, t) -> model_out` closure (params already
bound) so they stay agnostic of flax module plumbing and jit cleanly.

Multi-chip inference: every sampler accepts `sharding` (a NamedSharding
whose batch axis is a mesh axis). The initial noise — and hence the whole
lax.scan carry — is constrained to it, so one jitted program runs the
denoise loop batch-parallel over all chips of the mesh, XLA keeping every
per-step activation sharded (the TPU equivalent of the reference's 8-GPU
`PartialState` inference sharding, ldm/inference.py:56,159). The noise
values themselves depend only on (key, shape), never on the layout, so a
sharded run is sample-for-sample identical to the single-device run.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.diffusion.schedule import Schedule


def make_pos_encoding(batch: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """The vertical-ambiguity-breaking channel: zeros except azimuth column 0
    (ldm/train_unconditional.py:455-463; torch dim-2 == our W axis)."""
    pos = jnp.zeros((batch, h, w, 1), dtype)
    return pos.at[:, :, 0, :].set(1.0)


def _scan_ts(schedule: Schedule, num_steps: int):
    """(t, t_prev) pairs for the scan: t_prev is the NEXT timestep in the
    inference schedule (exact for any timestep_spacing), with -1 marking
    the final sigma=0 boundary. For the reference's 'leading' spacing this
    equals the diffusers convention t - T//n at every step (both < 0 at
    the end, and _acp maps any negative t to the final alpha)."""
    ts = schedule.timesteps(num_steps)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    return jnp.asarray(ts), jnp.asarray(ts_prev)


def _constrain(x, sharding):
    """Pin `x` (and through scan-carry propagation, the whole denoise loop)
    to a batch sharding. No-op outside jit or with sharding=None."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def denoise(model_fn: Callable, schedule: Schedule, x: jnp.ndarray,
            num_steps: int, rng: jax.Array, *,
            method: str = "ddim", eta: float = 0.0,
            pos_encoding: Optional[jnp.ndarray] = None,
            cond: Optional[jnp.ndarray] = None,
            collect_trajectory: bool = False):
    """Run the full reverse process from x ~ N(0, I).

    cond, if given, is concatenated on channels at every step (conditional
    pipelines, ldm/pipelines.py:496-502); pos_encoding likewise (:356-358).
    With collect_trajectory=True also returns the pre-step state at every
    timestep, (num_steps, B, H, W, C) — the `final_only=False` feature of
    LDMPipelineRange (ldm/pipelines.py:350-355).

    method: 'ddpm' (ancestral), 'ddim' (reference default), or 'dpmpp'
    (DPM-Solver++ 2M — no reference counterpart; same trained weights,
    ~2.5x fewer steps at matched quality, deterministic like eta=0 DDIM).
    """
    ts, ts_prev = _scan_ts(schedule, num_steps)

    def model_input(x):
        inp = x
        if cond is not None:
            inp = jnp.concatenate([inp, cond.astype(inp.dtype)], axis=-1)
        if pos_encoding is not None:
            inp = jnp.concatenate([inp, pos_encoding.astype(inp.dtype)],
                                  axis=-1)
        return inp

    if method == "dpmpp":
        def body(carry, t_trip):
            x, prev_x0, h_prev = carry
            t, tp, i = t_trip
            out = model_fn(model_input(x), t)
            prev = x
            x, x0, h = schedule.dpmpp_2m_step(out, t, tp, x, prev_x0,
                                              h_prev, i == 0)
            return (x, x0, h), (prev if collect_trajectory else None)

        init = (x, jnp.zeros_like(x), jnp.asarray(1.0, jnp.float32))
        (x, _, _), traj = jax.lax.scan(
            body, init, (ts, ts_prev, jnp.arange(num_steps)))
    else:
        def body(carry, t_pair):
            x, rng = carry
            t, tp = t_pair
            out = model_fn(model_input(x), t)
            rng, sub = jax.random.split(rng)
            prev = x
            if method == "ddpm":
                x = schedule.ddpm_step(sub, out, t, tp, x)
            else:
                x = schedule.ddim_step(out, t, tp, x, eta=eta, rng=sub)
            return (x, rng), (prev if collect_trajectory else None)

        (x, _), traj = jax.lax.scan(body, (x, rng), (ts, ts_prev))
    if collect_trajectory:
        return x, traj
    return x


def ddpm_sample(model_fn, schedule: Schedule, rng: jax.Array,
                shape: Tuple[int, ...], num_steps: int = 1000,
                pos_encoding: bool = False, dtype=jnp.float32,
                sharding=None) -> jnp.ndarray:
    """Pixel-space ancestral sampling (DDPMPipelineRange)."""
    rng, init = jax.random.split(rng)
    x = _constrain(jax.random.normal(init, shape, dtype), sharding)
    pos = make_pos_encoding(shape[0], shape[1], shape[2], dtype) if pos_encoding else None
    return denoise(model_fn, schedule, x, num_steps, rng, method="ddpm",
                   pos_encoding=pos)


def ddim_sample(model_fn, schedule: Schedule, rng: jax.Array,
                shape: Tuple[int, ...], num_steps: int = 50, eta: float = 0.0,
                pos_encoding: bool = False, dtype=jnp.float32,
                sharding=None, method: str = "ddim") -> jnp.ndarray:
    """Pixel-space deterministic sampling (DDIMPipelineRange / RangeDM);
    method='dpmpp' swaps in the DPM-Solver++(2M) update."""
    rng, init = jax.random.split(rng)
    x = _constrain(jax.random.normal(init, shape, dtype), sharding)
    pos = make_pos_encoding(shape[0], shape[1], shape[2], dtype) if pos_encoding else None
    return denoise(model_fn, schedule, x, num_steps, rng, method=method,
                   eta=eta, pos_encoding=pos)


def latent_sample(model_fn, vae_decode: Callable, schedule: Schedule,
                  rng: jax.Array, latent_shape: Tuple[int, ...],
                  scaling_factor: float, num_steps: int = 50,
                  eta: float = 0.0, method: str = "ddim",
                  pos_encoding: bool = True,
                  cond: Optional[jnp.ndarray] = None,
                  final_only: bool = True,
                  dtype=jnp.float32,
                  sharding=None):
    """Latent diffusion sampling + VAE decode (LDMPipelineRange; conditional
    when `cond` is provided, LDMUpscalePipelineRange). final_only=False
    returns (image, per-step decoded images) — the denoising-trajectory
    visualization of ldm/pipelines.py:350-355 — with the per-step decodes
    vmapped over the collected latents instead of interleaved."""
    rng, init = jax.random.split(rng)
    latents = _constrain(jax.random.normal(init, latent_shape, dtype),
                         sharding)
    latents = latents * schedule.init_noise_sigma
    if cond is not None:
        cond = _constrain(cond, sharding)
    pos = (make_pos_encoding(latent_shape[0], latent_shape[1], latent_shape[2],
                             dtype) if pos_encoding else None)
    out = denoise(model_fn, schedule, latents, num_steps, rng,
                  method=method, eta=eta, pos_encoding=pos, cond=cond,
                  collect_trajectory=not final_only)
    if final_only:
        return vae_decode(out / scaling_factor)
    latents, traj = out
    image = vae_decode(latents / scaling_factor)
    traj_images = jax.lax.map(lambda z: vae_decode(z / scaling_factor), traj)
    return image, traj_images


def conditional_latent_sample(model_fn, vae_decode, schedule, rng,
                              latent_shape, scaling_factor, cond,
                              num_steps: int = 50, **kw):
    """Alias with the conditional argument mandatory (upsampling/inpainting,
    ldm/inference_conditional.py:160-170)."""
    return latent_sample(model_fn, vae_decode, schedule, rng, latent_shape,
                         scaling_factor, num_steps=num_steps, cond=cond,
                         pos_encoding=kw.pop("pos_encoding", False), **kw)
