"""DPM-Solver++(2M) matched quality for the CONDITIONAL tasks (VERDICT r4
next #6): the 2.5x-fewer-steps claim was unconditional-only; this drives
dpmpp-20 vs ddim-50 through trained toy upsample and inpainting chains and
gates MAE parity — the metric of the reference's conditional evaluation
(ldm/inference_conditional.py:141-210 -> metrics/mae.py).

One VAE (no GAN, recon-gated) is trained on the synthetic world of
tests/test_quality_gate_e2e.py and shared by both conditional legs; each
leg trains a conditional LDM through the real LdmTrainer (artifact handoff
via vae_checkpoint like the flagship composition), then samples held-out
conditions through build_conditional_sampler with both solvers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_quality_gate_e2e import synthetic_world_scan, tiny_spec, H, W
from rangeldm_tpu.geometry import range_image_np
from rangeldm_tpu.metrics.mae import densification_mae, inpainting_mae
from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig
from rangeldm_tpu.utils.config import Cfg

N_TRAIN = 32
N_HELD = 16
MASK_FRAC = 0.125            # 8 of 64 azimuth columns


def _mask_batch(imgs):
    """The dataset's inpainting convention (data/datasets.py __getitem__):
    +1 over the leading masked sector, masked image = -1 there."""
    n, h, w, _ = imgs.shape
    m = -np.ones((n, h, w, 1), np.float32)
    end = int(MASK_FRAC * w)
    m[:, :, :end, :] = 1.0
    masked = np.where(m < 0, imgs, -1.0).astype(np.float32)
    return m, masked


@pytest.mark.heavy
def test_dpmpp_matched_quality_conditional(rng, tmp_path):
    from rangeldm_tpu.parallel.mesh import make_mesh
    from rangeldm_tpu.sample_conditional import build_conditional_sampler
    from rangeldm_tpu.sample_ldm import load_pipeline
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu.train_vae import VaeTrainer

    mesh1 = make_mesh(1)     # single device: long run on one CPU core
    spec = tiny_spec()
    imgs = np.stack([range_image_np(synthetic_world_scan(rng, spec), spec)[0]
                     for _ in range(N_TRAIN)])
    held = np.stack([range_image_np(synthetic_world_scan(rng, spec), spec)[0]
                     for _ in range(N_HELD)])

    # ---- shared stage: VAE (no GAN: MAE needs reconstruction, not
    # adversarial texture; disc never starts) ---------------------------
    vt = VaeTrainer(Cfg.wrap({
        "output_dir": str(tmp_path / "vae"), "batch_size": 8,
        "image_size": [H, W], "base_learning_rate": 2.5e-4,
        "vae": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4,
                "scaling_factor": 1.0},
        # disc never starts (pure recon), but it is still constructed:
        # 16-beam toy images need the 2-layer PatchGAN variant (same knobs
        # as test_flagship_composition.py)
        "loss": {"disc_start": 10 ** 9, "range_weight": 40.0,
                 "intensity_weight": 10.0, "kl_weight": 1.0e-3,
                 "metakernel": False, "disc_ndf": 16, "disc_num_layers": 2},
        "data": {"sensor": "kitti360", "width": W},
        "tensorboard": False,
    }), mesh=mesh1)

    def vae_batches(n_steps):
        for i in range(n_steps):
            yield {"jpg": imgs[(np.arange(8) + 8 * i) % N_TRAIN]}

    vt.fit(vae_batches(300), max_steps=300, log_every=100)
    vae_artifact = vt.save_final()

    # latent-scale calibration as in the flagship composition
    moments = np.asarray(jax.jit(lambda x: vt.vae.apply(
        {"params": jax.device_get(vt.state.gen_params)["vae"]}, x,
        method="encode_moments"))(jnp.asarray(imgs)))
    sf = 1.0 / float(np.std(moments[..., :4]))
    print(f"[cond-dpmpp] scaling_factor {sf:.3f}")

    lh, lw = H // 2, W // 2
    results = {}
    for mode, cond_ch, cfg_key in (("upsample", 4, {"upsample": 2}),
                                   ("inpainting", 5,
                                    {"inpainting": MASK_FRAC})):
        zoo.ZOO["tiny_cond_dpmpp"] = lambda cc=cond_ch: zoo.ModelSpec(
            name="tiny_cond_dpmpp",
            unet=UNetConfig(sample_size=(lh, lw), in_channels=4 + cc,
                            out_channels=4, block_out_channels=(32, 64),
                            down_block_types=("DownBlock2D", "DownBlock2D"),
                            up_block_types=("UpBlock2D", "UpBlock2D"),
                            add_mid_attention=False),
            vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4,
                          scaling_factor=sf),
            image_size=(H, W), pos_encoding=False, cond_channels=cond_ch)
        tr = LdmTrainer(Cfg.wrap({
            "model": "tiny_cond_dpmpp",
            "output_dir": str(tmp_path / f"ldm_{mode}"),
            "train_batch_size": 8, "use_ema": False, "with_vae": True,
            "learning_rate": 2e-3, "lr_warmup_steps": 50,
            "total_steps": 700, "tensorboard": False,
            "vae_checkpoint": vae_artifact, **cfg_key,
        }), mesh=mesh1)
        params_untrained = jax.device_get(tr.state.params)

        def batches(n_steps, mode=mode):
            for i in range(n_steps):
                b = {"jpg": imgs[(np.arange(8) + 8 * i) % N_TRAIN]}
                if mode == "upsample":
                    b["down"] = b["jpg"][:, 1::2]
                else:
                    m, masked = _mask_batch(b["jpg"])
                    b["inpainting_mask"], b["masked_image"] = m, masked
                yield b

        last = tr.fit(batches(700), max_steps=700, log_every=350)
        assert np.isfinite(last["loss"])
        pipe = load_pipeline(tr.save_final(), dtype=jnp.float32)

        if mode == "upsample":
            cond_inputs = {"down": jnp.asarray(held[:, 1::2])}
        else:
            m, masked = _mask_batch(held)
            cond_inputs = {"inpainting_mask": jnp.asarray(m),
                           "masked_image": jnp.asarray(masked)}

        def mae_for(unet_params, num_steps, method, mode=mode,
                    pipe=pipe, cond_inputs=cond_inputs):
            p = dict(pipe, unet_params={"params": unet_params})
            sampler = build_conditional_sampler(
                p, batch_size=N_HELD, mode=mode, num_steps=num_steps,
                factor=2, dtype=jnp.float32, method=method)
            out = np.asarray(sampler(jax.random.PRNGKey(0), cond_inputs),
                             np.float32)
            assert out.shape == held.shape and np.isfinite(out).all()
            # range channel, decoded to meters with the toy spec's linear
            # normalization (mean 20, std 40)
            kw = dict(encoding="linear", mean=spec.mean, std=spec.std)
            if mode == "upsample":
                return densification_mae(out[..., 0], held[..., 0],
                                         factor=2, **kw)["mae"]
            return inpainting_mae(out[..., 0], held[..., 0],
                                  masked_columns=int(MASK_FRAC * W), **kw)

        trained = jax.device_get(tr.state.params)
        mae_unt = mae_for(params_untrained, 50, "ddim")
        mae_ddim = mae_for(trained, 50, "ddim")
        mae_dpmpp = mae_for(trained, 20, "dpmpp")
        print(f"[cond-dpmpp] {mode}: untrained ddim-50 {mae_unt:.3f} m, "
              f"trained ddim-50 {mae_ddim:.3f} m, "
              f"trained dpmpp-20 {mae_dpmpp:.3f} m")
        results[mode] = (mae_unt, mae_ddim, mae_dpmpp)

    for mode, (mae_unt, mae_ddim, mae_dpmpp) in results.items():
        # the chain must actually have learned conditioning (otherwise the
        # parity gate below compares noise with noise and proves nothing).
        # Calibration (single measured run, seed PRNGKey(0)): trained/
        # untrained MAE ratios are 0.639 (upsample: 4.877/7.637 m) and
        # 0.626 (inpainting: 0.642/1.026 m); the floor is set by the toy
        # VAE's recon quality plus the intrinsic uncertainty of the random
        # synthetic world, not by trainability, so 0.5x is unreachable at
        # this scale. Gate at 0.75x: clear daylight above the measured
        # ratios, far below the ~1.0 a noise-to-noise comparison would give.
        assert mae_ddim < 0.75 * mae_unt, (mode, mae_ddim, mae_unt)
        # the matched-quality gate: dpmpp-20 within 10% of ddim-50 MAE —
        # the conditional counterpart of the unconditional MMD/JSD gates
        # in test_flagship_composition.py. Measured: dpmpp-20 BEATS ddim-50
        # on both tasks (ratios 0.862 upsample, 0.804 inpainting), as the
        # 2M solver's lower discretization error predicts at few steps.
        assert mae_dpmpp < 1.10 * mae_ddim, (mode, mae_dpmpp, mae_ddim)
