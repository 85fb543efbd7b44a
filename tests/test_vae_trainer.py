"""VAE GAN trainer tests: alternating steps run, losses behave, adaptive
weight matches a finite-difference-free analytic cross-check."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from rangeldm_tpu.models.discriminator import NLayerDiscriminatorMetaKernel
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.training.vae_trainer import (
    VaeLossConfig, create_vae_gan_state, make_vae_gan_steps, make_disc_apply,
    reconstruction_loss, hinge_d_loss,
)


def build(rng_seed=0, disc_start=0):
    vae_cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    vae = AutoencoderKL(vae_cfg)
    disc = NLayerDiscriminatorMetaKernel(ndf=16, n_layers=2)
    x = jnp.zeros((2, 16, 64, 2))
    vae_params = vae.init({"params": jax.random.PRNGKey(rng_seed)}, x,
                          rng=jax.random.PRNGKey(1))
    disc_vars = disc.init(jax.random.PRNGKey(2), x)
    cfg = VaeLossConfig(disc_start=disc_start)
    gen_tx = optax.adam(1e-4)
    disc_tx = optax.adam(1e-4)
    state = create_vae_gan_state(vae_params, disc_vars, gen_tx, disc_tx, cfg)
    gen_step, disc_step = make_vae_gan_steps(
        vae, make_disc_apply(disc), gen_tx, disc_tx, cfg)
    return state, gen_step, disc_step


@pytest.mark.heavy
def test_alternating_steps_run_and_update(rng):
    state, gen_step, disc_step = build(disc_start=0)
    batch = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    p0 = state.gen_params["vae"]["encoder"]["conv_in"]["kernel"]
    state, m = jax.jit(gen_step)(state, batch, key)
    assert np.isfinite(float(m["total_loss"]))
    assert float(m["d_weight"]) >= 0
    p1 = state.gen_params["vae"]["encoder"]["conv_in"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    d0 = jax.tree.leaves(state.disc_params)[0]
    state, dm = jax.jit(disc_step)(state, batch, key)
    assert np.isfinite(float(dm["disc_loss"]))
    d1 = jax.tree.leaves(state.disc_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


@pytest.mark.heavy
def test_disc_warmup_gates_gan_terms(rng):
    """Before disc_start the GAN term and disc loss are zero
    (adopt_weight, losses/__init__.py:15-18, 326-328)."""
    state, gen_step, disc_step = build(disc_start=10_000)
    batch = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    state, m = jax.jit(gen_step)(state, batch, key)
    assert float(m["disc_factor"]) == 0.0
    state, dm = jax.jit(disc_step)(state, batch, key)
    assert float(dm["disc_loss"]) == 0.0
    # generator loss reduces to nll + kl
    expect = float(m["nll_loss"]) + 1e-6 * float(m["kl_loss"])
    np.testing.assert_allclose(float(m["total_loss"]), expect, rtol=1e-5)


def test_reconstruction_loss_weights():
    x = jnp.zeros((1, 2, 2, 2))
    xrec = jnp.ones((1, 2, 2, 2)) * jnp.asarray([0.5, -0.25])
    cfg = VaeLossConfig()
    rec = np.asarray(reconstruction_loss(x, xrec, cfg))
    np.testing.assert_allclose(rec, 40 * 0.5 + 10 * 0.25, rtol=1e-6)


def test_hinge_loss_values():
    real = jnp.asarray([2.0, 0.5])
    fake = jnp.asarray([-2.0, 0.5])
    # relu(1-real)=[0, .5] mean .25 ; relu(1+fake)=[0, 1.5] mean .75
    np.testing.assert_allclose(float(hinge_d_loss(real, fake)), 0.5)


def test_ema_shadow_tracks_generator(rng):
    state, gen_step, _ = build(disc_start=0)
    batch = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    shadow0 = state.ema_params["encoder"]["conv_in"]["kernel"]
    jstep = jax.jit(gen_step)
    for i in range(3):
        state, _ = jstep(state, batch, jax.random.fold_in(key, i))
    shadow1 = state.ema_params["encoder"]["conv_in"]["kernel"]
    live = state.gen_params["vae"]["encoder"]["conv_in"]["kernel"]
    # early warmup decay is tiny -> shadow is close to live params
    assert not np.allclose(np.asarray(shadow0), np.asarray(shadow1))
    assert np.abs(np.asarray(shadow1) - np.asarray(live)).max() < 0.05


def test_mixed_precision_bf16_steps_run(tmp_path):
    """mixed_precision: bf16 runs the VAE/disc forwards in bf16 with all
    GAN loss arithmetic upcast to f32 at the module boundaries — both
    steps must produce finite f32 losses and f32 parameter updates."""
    from rangeldm_tpu.train_vae import VaeTrainer
    from rangeldm_tpu.utils.config import Cfg

    cfg = Cfg.wrap({
        "output_dir": str(tmp_path / "v"), "batch_size": 4,
        "image_size": [32, 64], "mixed_precision": "bf16",
        "vae": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4},
        "loss": {"disc_start": 0, "metakernel": True},
    })
    tr = VaeTrainer(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    state, gm = tr.gen_step(tr.state, x, key)
    state, dm = tr.disc_step(state, x, key)
    for v in {**gm, **dm}.values():
        assert np.isfinite(float(v))
    assert gm["total_loss"].dtype == jnp.float32
    leaf = jax.tree.leaves(state.gen_params["vae"])[0]
    assert leaf.dtype == jnp.float32          # params stay f32


@pytest.mark.heavy
def test_adaptive_weight_fast_path_equals_full_decode(rng):
    """The pre-last-features fast path for the adaptive GAN weight (only
    conv_out.weight is differentiated, so its VJP needs just the features
    feeding conv_out) must give EXACTLY the d_weight of differentiating a
    full decoder re-run with a substituted last kernel — and the features
    decode must recompose to the decoder output."""
    from rangeldm_tpu.models.layers import wrap_pad_azimuth
    from rangeldm_tpu.models.vae import gaussian_sample

    vae_cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    vae = AutoencoderKL(vae_cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    vp = vae.init({"params": jax.random.PRNGKey(0)}, x,
                  rng=jax.random.PRNGKey(1))["params"]
    moments = vae.apply({"params": vp}, x, method="encode_moments")
    z = gaussian_sample(jax.random.PRNGKey(3), moments)

    # recomposition: features -> conv_out == decode
    feats = vae.apply({"params": vp}, z, method="decode_features")
    w = vp["decoder"]["conv_out"]["kernel"]
    b = vp["decoder"]["conv_out"]["bias"]
    a = wrap_pad_azimuth(feats, 1, 1)
    y = jax.lax.conv_general_dilated(
        a, w, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    full = vae.apply({"params": vp}, z, method="decode")
    np.testing.assert_allclose(np.asarray(y), np.asarray(full),
                               rtol=1e-6, atol=1e-6)

    # VJP equality for an arbitrary cotangent
    def dec_full(wk):
        p2 = {**vp, "decoder": {**vp["decoder"],
                                "conv_out": {**vp["decoder"]["conv_out"],
                                             "kernel": wk}}}
        return vae.apply({"params": p2}, z, method="decode")

    def dec_fast(wk):
        return jax.lax.conv_general_dilated(
            a, wk, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    cot = jnp.asarray(rng.standard_normal(full.shape).astype(np.float32))
    _, vjp_full = jax.vjp(dec_full, w)
    _, vjp_fast = jax.vjp(dec_fast, w)
    np.testing.assert_allclose(np.asarray(vjp_fast(cot)[0]),
                               np.asarray(vjp_full(cot)[0]),
                               rtol=1e-5, atol=1e-6)


def test_disc_gating_shares_the_global_step(rng):
    """Both halves of batch i must gate the GAN terms at the SAME global
    step (the reference's adopt_weight sees one global_step for gen and
    disc): gen_step increments before disc_step runs, so with
    disc_start=1 the first batch's disc loss must still be gated to zero
    and the second batch's must be live."""
    state, gen_step, disc_step = build(disc_start=1)
    batch = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    state, gm = jax.jit(gen_step)(state, batch, key)
    assert float(gm["disc_factor"]) == 0.0
    state, dm = jax.jit(disc_step)(state, batch, key)
    assert float(dm["disc_loss"]) == 0.0, "disc activated a batch early"
    state, gm = jax.jit(gen_step)(state, batch, key)
    assert float(gm["disc_factor"]) == 1.0
    state, dm = jax.jit(disc_step)(state, batch, key)
    assert float(dm["disc_loss"]) != 0.0


def test_perceptual_term_counts_channel_multiplicity(rng):
    """The reference adds p_loss to the elementwise (B, C, H, W) rec map;
    our channel-summed map must carry the xC multiplicity or the
    effective perceptual weight halves at used_feature=2. With the GAN
    term gated off, total_loss(w=1) - total_loss(w=0) == C * H * W *
    p_loss_per_sample_mean for a constant perceptual fn."""
    import optax
    from rangeldm_tpu.training.vae_trainer import (
        VaeLossConfig, create_vae_gan_state, make_disc_apply,
        make_vae_gan_steps,
    )
    from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
    from rangeldm_tpu.models.discriminator import NLayerDiscriminatorMetaKernel
    vae_cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    vae = AutoencoderKL(vae_cfg)
    disc = NLayerDiscriminatorMetaKernel(ndf=16, n_layers=2)
    x0 = jnp.zeros((2, 16, 64, 2))
    vae_params = vae.init({"params": jax.random.PRNGKey(0)}, x0,
                          rng=jax.random.PRNGKey(1))
    disc_vars = disc.init(jax.random.PRNGKey(2), x0)
    batch = jnp.asarray(rng.standard_normal((2, 16, 64, 2)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    const = 0.37
    totals = {}
    for w in (0.0, 1.0):
        cfg = VaeLossConfig(disc_start=10**9, perceptual_weight=w)
        state = create_vae_gan_state(vae_params, disc_vars,
                                     optax.adam(1e-4), optax.adam(1e-4), cfg)
        gen_step, _ = make_vae_gan_steps(
            vae, make_disc_apply(disc), optax.adam(1e-4), optax.adam(1e-4),
            cfg, perceptual_fn=lambda a, b: const * jnp.ones(a.shape[0]))
        _, m = jax.jit(gen_step)(state, batch, key)
        totals[w] = float(m["total_loss"])
    expected = 2 * 16 * 64 * const          # C * H * W * p_loss mean
    assert totals[1.0] - totals[0.0] == pytest.approx(expected, rel=1e-4)
