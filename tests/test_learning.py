"""Convergence smoke tests: the training machinery must actually learn.

Overfit tiny models on a fixed target distribution and assert large loss
reductions — catches sign errors, broken grads, mis-wired EMA/optimizer
state that shape tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rangeldm_tpu.diffusion.schedule import Schedule
from rangeldm_tpu.models.unet import UNet2D, UNetConfig
from rangeldm_tpu.training.ldm_trainer import LdmTrainConfig, make_ldm_train_step
from rangeldm_tpu.training.train_state import TrainState
import pytest


def test_power_decay_matches_diffusers_convention():
    """Twin of diffusers EMAModel.get_decay with use_ema_warmup
    (ldm/train_unconditional.py:320-329): decay is computed from
    optimization_step - 1, so the FIRST update has decay 0.0 — the EMA
    shadow starts as a copy of the params, not a blend with the random
    init. The trainers pass the pre-increment step counter."""
    from rangeldm_tpu.training.ema import power_decay

    def diffusers_decay(opt_step, inv_gamma=1.0, power=0.75,
                        max_decay=0.9999):
        step = max(0, opt_step - 1)
        if step <= 0:
            return 0.0
        return float(np.clip(1.0 - (1.0 + step / inv_gamma) ** -power,
                             0.0, max_decay))

    for opt_step in (1, 2, 3, 10, 100, 10_000, 10_000_000):
        got = float(power_decay(jnp.asarray(opt_step - 1, jnp.int32)))
        assert abs(got - diffusers_decay(opt_step)) < 1e-7, opt_step


def test_first_ema_update_copies_params():
    """Through the real train step: after ONE optimizer step from random
    init, the EMA shadow equals the updated params up to float rounding
    (decay 0.0 through the diffusers `s - (1-d)*(s-p)` update form, which
    is not bit-exact at d=0); after the second it visibly lags. A wrong
    (post-increment) step would blend with the random init — O(1e-1)
    differences, 9 orders of magnitude above the rounding floor."""
    cfg = UNetConfig(sample_size=(4, 8), in_channels=3, out_channels=2,
                     block_out_channels=(8, 8), norm_num_groups=4,
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     add_mid_attention=False)
    unet = UNet2D(cfg)
    x0 = np.zeros((1, 4, 8, 3), np.float32)
    params = unet.init(jax.random.PRNGKey(0), x0, np.zeros((1,), np.int32))
    tx = optax.adam(1e-3)
    step = make_ldm_train_step(
        unet_apply=lambda p, x, t: unet.apply({"params": p}, x, t),
        schedule=Schedule.create(), tx=tx,
        cfg=LdmTrainConfig(pos_encoding=True, pixel_scaling=1.0))
    state = TrainState.create(params["params"], tx, with_ema=True)
    batch = jnp.zeros((4, 4, 8, 2), jnp.float32)
    jstep = jax.jit(step)
    state, _ = jstep(state, batch, jax.random.PRNGKey(1))
    for p, e in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(e), atol=1e-8)
    state, _ = jstep(state, batch, jax.random.PRNGKey(1))
    diffs = [float(np.abs(np.asarray(p) - np.asarray(e)).max())
             for p, e in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(state.ema_params))]
    assert max(diffs) > 1e-6


@pytest.mark.heavy
def test_pixel_diffusion_overfits_constant_image():
    cfg = UNetConfig(sample_size=(8, 32), in_channels=3, out_channels=2,
                     block_out_channels=(32, 32),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     add_mid_attention=False)
    unet = UNet2D(cfg)
    x0 = np.zeros((1, 8, 32, 3), np.float32)
    params = unet.init(jax.random.PRNGKey(0), x0, np.zeros((1,), np.int32))

    schedule = Schedule.create()
    tx = optax.adam(2e-3)
    step = make_ldm_train_step(
        unet_apply=lambda p, x, t: unet.apply({"params": p}, x, t),
        schedule=schedule, tx=tx,
        cfg=LdmTrainConfig(pos_encoding=True, pixel_scaling=1.0))
    state = TrainState.create(params["params"], tx, with_ema=True)

    # fixed structured target: a vertical gradient image
    target = np.broadcast_to(
        np.linspace(-1, 1, 8, dtype=np.float32)[None, :, None, None],
        (16, 8, 32, 2)).copy()
    batch = jnp.asarray(target)

    jstep = jax.jit(step)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(150):
        state, m = jstep(state, batch, rng)
        losses.append(float(m["loss"]))
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < 0.5 * early, (early, late)
    # EMA shadow must track and stay finite
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(state.ema_params))


@pytest.mark.heavy
def test_vae_overfits_reconstruction(rng):
    from rangeldm_tpu.models.discriminator import NLayerDiscriminatorMetaKernel
    from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
    from rangeldm_tpu.training.vae_trainer import (
        VaeLossConfig, create_vae_gan_state, make_disc_apply,
        make_vae_gan_steps,
    )
    vcfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    vae = AutoencoderKL(vcfg)
    disc = NLayerDiscriminatorMetaKernel(ndf=16, n_layers=2)
    x = jnp.asarray(np.broadcast_to(
        np.linspace(-0.5, 0.5, 64, np.float32)[None, None, :, None],
        (4, 16, 64, 2)).copy())
    vp = vae.init({"params": jax.random.PRNGKey(0)}, x,
                  rng=jax.random.PRNGKey(1))
    dv = disc.init(jax.random.PRNGKey(2), x)
    lcfg = VaeLossConfig(disc_start=10_000)   # pure reconstruction phase
    gen_tx = optax.adam(1e-3)
    disc_tx = optax.adam(1e-3)
    state = create_vae_gan_state(vp, dv, gen_tx, disc_tx, lcfg)
    gen_step, _ = make_vae_gan_steps(vae, make_disc_apply(disc), gen_tx,
                                     disc_tx, lcfg)
    jstep = jax.jit(gen_step)
    key = jax.random.PRNGKey(3)
    recs = []
    for i in range(60):
        state, m = jstep(state, x, key)
        recs.append(float(m["rec_loss"]))
    assert np.mean(recs[-5:]) < 0.5 * np.mean(recs[:5]), (recs[:5], recs[-5:])
