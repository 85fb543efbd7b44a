"""VAE GAN training (T4 + E1-E4): alternating generator/discriminator steps.

Re-implements `GeneralLPIPSWithDiscriminator`
(vae/sgm/modules/autoencoding/losses/__init__.py:89-378) and the engine's
two-optimizer training_step (vae/sgm/models/autoencoder.py:186-221) as two
pure jitted steps (the reference relies on PL-version-specific optimizer_idx
behavior; we make the alternation explicit, per SURVEY.md section 3.3).

The adaptive discriminator weight (losses/__init__.py:200-215) —
||d nll/d W_last|| / ||d g/d W_last|| at the decoder's output conv — is
computed with one jax.vjp of the decoder at stop_grad(z) and two cotangent
pulls; numerically identical to the reference's double autograd.grad.

Shipped KITTI config: disc_start=200000, disc_weight=0.5, metakernel
discriminator, kl weight 1e-6, range/intensity weights 40/10
(vae/configs/kitti360.yaml).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rangeldm_tpu.models.vae import AutoencoderKL, gaussian_kl, gaussian_sample
from rangeldm_tpu.training.ema import ema_update, warmup_decay


@dataclasses.dataclass(frozen=True)
class VaeLossConfig:
    disc_start: int = 200000
    disc_weight: float = 0.5
    disc_factor: float = 1.0
    range_weight: float = 40.0
    intensity_weight: float = 10.0
    used_feature: int = 2
    kl_weight: float = 1e-6
    disc_loss: str = "hinge"            # 'hinge' | 'vanilla'
    learn_logvar: bool = False
    logvar_init: float = 0.0
    ema_decay: float = 0.9999
    # optional branches (losses/__init__.py:239-305)
    encoding: str = "linear"            # range encoding: 'linear'|'log'|'inverse'
    use_rec_loss_true: bool = False     # L1 in true (decoded) range
    use_rec_loss_true_power: bool = False
    rec_power: float = 2.0
    bev_rec_weight: float = 0.0         # L1 on BEV log-density
    perceptual_weight: float = 0.0
    bev_perceptual: bool = False        # perceptual over BEV instead of image
    disc_bev: bool = False              # discriminator sees BEV grids


class VaeGanState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any                      # {'vae': ..., 'logvar': scalar}
    disc_params: Any
    disc_batch_stats: Any
    gen_opt: Any
    disc_opt: Any
    ema_params: Optional[Any] = None     # shadow of gen_params['vae']
    ema_updates: Optional[jnp.ndarray] = None


def true_range_l1(x, xrec, cfg: VaeLossConfig):
    """L1 in decoded (metric) range for log/inverse encodings
    (losses/__init__.py:239-242): log -> |64^a - 64^b|, inverse ->
    |1/max(a, 1e-4) - 1/max(b, 1e-4)|."""
    a, b = x[..., 0], xrec[..., 0]
    if cfg.encoding == "log":
        return jnp.abs(64.0 ** a - 64.0 ** b)
    if cfg.encoding == "inverse":
        return jnp.abs(1.0 / jnp.maximum(a, 1e-4) - 1.0 / jnp.maximum(b, 1e-4))
    raise NotImplementedError(
        "true-range loss requires log or inverse encoding "
        "(losses/__init__.py:244-245)")


def reconstruction_loss(x, xrec, cfg: VaeLossConfig):
    """Channel-weighted L1 (losses/__init__.py:252-254); NHWC channel 0 =
    range, 1 = intensity. Optional true-range / powered-range variants for
    log/inverse encodings (:239-250)."""
    if cfg.use_rec_loss_true:
        rec = true_range_l1(x, xrec, cfg)
    elif cfg.use_rec_loss_true_power:
        if cfg.encoding != "log":
            raise NotImplementedError(
                "rec_loss_true_power requires log encoding (:248-249)")
        rec = jnp.abs((64.0 ** x[..., 0]) ** cfg.rec_power -
                      (64.0 ** xrec[..., 0]) ** cfg.rec_power)
    else:
        rec = cfg.range_weight * jnp.abs(x[..., 0] - xrec[..., 0])
    if cfg.used_feature > 1:
        rec = rec + cfg.intensity_weight * jnp.abs(x[..., 1] - xrec[..., 1])
    return rec


def _bev_three_channel(vox):
    """(B, 2, Gy, Gx) BEV [density, intensity] -> 3 channels for image
    perceptual nets (losses/__init__.py:270-274: cat(density, density,
    intensity))."""
    return jnp.concatenate([vox[:, :1], vox[:, :1], vox[:, 1:]], axis=1)


def hinge_d_loss(logits_real, logits_fake):
    logits_real = logits_real.astype(jnp.float32)
    logits_fake = logits_fake.astype(jnp.float32)
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real)) +
                  jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    logits_real = logits_real.astype(jnp.float32)
    logits_fake = logits_fake.astype(jnp.float32)
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))


def create_vae_gan_state(vae_params, disc_vars, gen_tx, disc_tx,
                         cfg: VaeLossConfig) -> VaeGanState:
    gen_params = {"vae": vae_params["params"],
                  "logvar": jnp.asarray(cfg.logvar_init, jnp.float32)}
    return VaeGanState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_vars["params"],
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_vars["params"]),
        ema_params=jax.tree.map(jnp.copy, vae_params["params"]),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def make_vae_gan_steps(vae: AutoencoderKL, disc_apply: Callable,
                       gen_tx, disc_tx, cfg: VaeLossConfig,
                       voxel_fn: Optional[Callable] = None,
                       perceptual_fn: Optional[Callable] = None):
    """Returns (gen_step, disc_step), each (state, batch, rng) ->
    (state, metrics). `disc_apply(variables, x, train, mutable)` wraps the
    discriminator module.

    voxel_fn: (B, H, W, C) range images -> (B, 2, Gy, Gx) BEV grids
    (geometry.to_voxel with the dataset spec); required when bev_rec_weight,
    bev_perceptual, or disc_bev is set.
    perceptual_fn: (x, xrec) -> per-sample (B,) or broadcastable loss
    (e.g. models.lpips distance); required when perceptual_weight > 0.
    """
    d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    if (cfg.bev_rec_weight > 0 or cfg.bev_perceptual or cfg.disc_bev) \
            and voxel_fn is None:
        raise ValueError("voxel_fn required for the BEV loss branches")
    if cfg.perceptual_weight > 0 and perceptual_fn is None:
        raise ValueError("perceptual_fn required when perceptual_weight > 0")

    def disc_input(x, vox=None):
        """What the discriminator consumes (losses/__init__.py:310-312,
        361-363): BEV grids (as NHWC) when disc_bev, else the range image."""
        if not cfg.disc_bev:
            return x
        v = vox if vox is not None else voxel_fn(x)
        return jnp.transpose(v, (0, 2, 3, 1))

    def forward(vae_params, batch, rng):
        # loss math is always f32 regardless of the module compute dtype
        # (mixed_precision: bf16 runs the VAE/disc forward in bf16; the
        # reference trains f32, so bf16 is opt-in and the GAN arithmetic —
        # nll, KL, hinge, adaptive weight — stays f32 either way)
        moments = vae.apply({"params": vae_params}, batch,
                            method="encode_moments").astype(jnp.float32)
        z = gaussian_sample(rng, moments)
        xrec = vae.apply({"params": vae_params}, z,
                         method="decode").astype(jnp.float32)
        return xrec, z, moments

    def disc_factor_at(step):
        return jnp.where(step >= cfg.disc_start, cfg.disc_factor, 0.0)

    # ---------------- generator ----------------
    def gen_step(state: VaeGanState, batch: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(gen_params):
            vp, logvar = gen_params["vae"], gen_params["logvar"]
            if not cfg.learn_logvar:
                logvar = jax.lax.stop_gradient(logvar)
            xrec, z, moments = forward(vp, batch, rng)

            rec = reconstruction_loss(batch, xrec, cfg)
            extra = {}
            if cfg.encoding in ("log", "inverse") and not cfg.use_rec_loss_true:
                extra["rec_loss_true"] = jnp.mean(
                    true_range_l1(batch, xrec, cfg))

            vox_in = vox_rec = None
            if cfg.bev_rec_weight > 0 or cfg.bev_perceptual or cfg.disc_bev:
                vox_in, vox_rec = voxel_fn(batch), voxel_fn(xrec)
            if cfg.perceptual_weight > 0:
                if cfg.bev_perceptual:
                    p_loss = perceptual_fn(_bev_three_channel(vox_in),
                                           _bev_three_channel(vox_rec))
                else:
                    p_loss = perceptual_fn(batch, xrec)
                extra["p_loss"] = jnp.mean(p_loss)
                if jnp.ndim(p_loss) == 1:          # (B,) -> broadcast over HW
                    # the reference adds p_loss to the ELEMENTWISE
                    # (B, C, H, W) rec map (losses/__init__.py:164-199);
                    # ours is already channel-summed to (B, H, W), so the
                    # per-sample term must carry the channel multiplicity
                    # or the effective perceptual weight (and through it
                    # the adaptive d_weight) would shrink by C
                    p_loss = p_loss[:, None, None] * cfg.used_feature
                rec = rec + cfg.perceptual_weight * p_loss

            # logvar enters once per element of the reference's (B, C, H, W)
            # map; rec here is channel-summed over C=used_feature
            nll = rec / jnp.exp(logvar) + cfg.used_feature * logvar
            nll_loss = jnp.sum(nll) / batch.shape[0]
            if cfg.bev_rec_weight > 0:
                bev = cfg.bev_rec_weight * jnp.abs(vox_in[:, 0] - vox_rec[:, 0])
                nll_loss = nll_loss + jnp.sum(bev) / batch.shape[0]
                extra["bev_rec_loss"] = jnp.mean(bev)
            kl = gaussian_kl(moments)
            kl_loss = jnp.sum(kl) / kl.shape[0]

            disc_vars = {"params": state.disc_params,
                         "batch_stats": state.disc_batch_stats}
            logits_fake, new_stats = disc_apply(
                disc_vars, disc_input(xrec, vox_rec), train=True,
                mutable=True)
            g_loss = -jnp.mean(logits_fake.astype(jnp.float32))

            # adaptive weight at the decoder's final conv kernel. The
            # reference's autograd.grad(·, last_layer) (losses/__init__.py:
            # 200-215) differentiates ONLY w.r.t. conv_out.weight, and
            # conv_out's input is independent of that weight — so compute
            # the pre-last-layer features ONCE and differentiate through
            # the single conv, instead of re-running (and re-backprop'ing)
            # the whole decoder per cotangent. Mathematically identical;
            # removes one full decoder forward + two full decoder
            # backwards from the step (coord configs keep the general
            # path: coordconv changes conv_out's input channels).
            w_last = vp["decoder"]["conv_out"]["kernel"]
            b_last = vp["decoder"]["conv_out"]["bias"]
            z_sg = jax.lax.stop_gradient(z)

            if not vae.cfg.coord:
                feats = vae.apply({"params": vp}, z_sg,
                                  method="decode_features")

                def dec(w):
                    a = feats
                    if vae.cfg.circular:
                        from rangeldm_tpu.models.layers import (
                            wrap_pad_azimuth,
                        )
                        a = wrap_pad_azimuth(a, 1, 1)
                        pad = ((1, 1), (0, 0))
                    else:
                        pad = ((1, 1), (1, 1))
                    y = jax.lax.conv_general_dilated(
                        a, w.astype(a.dtype), (1, 1), pad,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return (y + b_last.astype(a.dtype)).astype(jnp.float32)
            else:
                def dec(w):
                    p2 = {**vp, "decoder": {
                        **vp["decoder"],
                        "conv_out": {**vp["decoder"]["conv_out"],
                                     "kernel": w}}}
                    return vae.apply({"params": p2}, z_sg,
                                     method="decode").astype(jnp.float32)

            xrec2, dec_vjp = jax.vjp(dec, w_last)

            def nll_scalar(xr):
                """Mirrors the full nll (incl. perceptual/BEV terms) so the
                adaptive weight matches the reference's autograd.grad of the
                actual nll_loss graph (losses/__init__.py:200-215)."""
                r = reconstruction_loss(batch, xr, cfg)
                vr = voxel_fn(xr) if (cfg.bev_rec_weight > 0 or
                                      cfg.bev_perceptual) else None
                if cfg.perceptual_weight > 0:
                    if cfg.bev_perceptual:
                        p = perceptual_fn(_bev_three_channel(vox_in),
                                          _bev_three_channel(vr))
                    else:
                        p = perceptual_fn(batch, xr)
                    if jnp.ndim(p) == 1:
                        p = p[:, None, None]
                    r = r + cfg.perceptual_weight * p
                out = jnp.sum(r / jnp.exp(logvar) + logvar) / batch.shape[0]
                if cfg.bev_rec_weight > 0:
                    b = cfg.bev_rec_weight * jnp.abs(vox_in[:, 0] - vr[:, 0])
                    out = out + jnp.sum(b) / batch.shape[0]
                return out

            def g_scalar(xr):
                lf, _ = disc_apply(disc_vars, disc_input(xr), train=True,
                                   mutable=True)
                return -jnp.mean(lf.astype(jnp.float32))

            nll_cot = jax.grad(nll_scalar)(xrec2)
            g_cot = jax.grad(g_scalar)(xrec2)
            nll_g = dec_vjp(nll_cot)[0]
            g_g = dec_vjp(g_cot)[0]
            d_weight = (jnp.linalg.norm(nll_g.ravel()) /
                        (jnp.linalg.norm(g_g.ravel()) + 1e-4))
            d_weight = jax.lax.stop_gradient(
                jnp.clip(d_weight, 0.0, 1e4)) * cfg.disc_weight

            df = disc_factor_at(state.step)
            loss = nll_loss + d_weight * df * g_loss + cfg.kl_weight * kl_loss
            metrics = {"total_loss": loss, "nll_loss": nll_loss,
                       "rec_loss": jnp.mean(rec), "kl_loss": kl_loss,
                       "g_loss": g_loss, "d_weight": d_weight,
                       "disc_factor": df, "logvar": logvar, **extra}
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.gen_params)
        updates, gen_opt = gen_tx.update(grads, state.gen_opt,
                                         state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        ema_params, ema_updates = state.ema_params, state.ema_updates
        if ema_params is not None:
            ema_updates = ema_updates + 1
            decay = warmup_decay(ema_updates, cfg.ema_decay)
            ema_params = ema_update(ema_params, gen_params["vae"], decay)

        state = state.replace(step=state.step + 1, gen_params=gen_params,
                              gen_opt=gen_opt,
                              disc_batch_stats=new_stats["batch_stats"],
                              ema_params=ema_params, ema_updates=ema_updates)
        return state, metrics

    # ---------------- discriminator ----------------
    def disc_step(state: VaeGanState, batch: jnp.ndarray, rng: jax.Array):
        # distinct stream from gen_step: gen folds (rng, step) and runs
        # BEFORE incrementing, so a plain fold here at step s+1 would
        # reuse gen's key for step s+1 — bit-identical posterior noise in
        # disc_step(i) and gen_step(i+1). The extra constant fold
        # decorrelates the two streams.
        rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), 1)
        xrec, _, _ = forward(state.gen_params["vae"], batch, rng)
        xrec = jax.lax.stop_gradient(xrec)

        d_real = disc_input(batch)
        d_fake = disc_input(xrec)

        def loss_fn(disc_params):
            dv = {"params": disc_params,
                  "batch_stats": state.disc_batch_stats}
            logits_real, stats1 = disc_apply(dv, d_real, train=True,
                                             mutable=True)
            dv2 = {"params": disc_params,
                   "batch_stats": stats1["batch_stats"]}
            logits_fake, stats2 = disc_apply(dv2, d_fake, train=True,
                                             mutable=True)
            # gen_step incremented step already, so gate at step - 1: both
            # halves of batch i must share the same global_step (the
            # reference's adopt_weight uses one global_step for both,
            # losses/__init__.py:316-336) — otherwise the discriminator
            # would activate one batch earlier than the generator's
            # adversarial term at the disc_start boundary
            df = disc_factor_at(state.step - 1)
            d_loss = df * d_loss_fn(logits_real, logits_fake)
            metrics = {"disc_loss": d_loss,
                       "logits_real": jnp.mean(logits_real),
                       "logits_fake": jnp.mean(logits_fake)}
            return d_loss, (metrics, stats2)

        (_, (metrics, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.disc_params)
        updates, disc_opt = disc_tx.update(grads, state.disc_opt,
                                           state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        state = state.replace(disc_params=disc_params, disc_opt=disc_opt,
                              disc_batch_stats=stats["batch_stats"])
        return state, metrics

    return gen_step, disc_step


def make_disc_apply(disc_module):
    """Standard wrapper for the discriminator modules in this repo."""
    def disc_apply(variables, x, train: bool, mutable: bool):
        if mutable:
            return disc_module.apply(variables, x, train=train,
                                     mutable=["batch_stats"])
        return disc_module.apply(variables, x, train=train), None
    return disc_apply
