"""End-to-end smoke tests: tiny-LDM training -> checkpoint -> resume ->
pipeline save -> reload -> sampling -> artifact outputs. Runs on the
8-device virtual CPU mesh."""

import glob
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig
from rangeldm_tpu.utils.config import Cfg


TINY = zoo.ModelSpec(
    name="tiny_test",
    unet=UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                    block_out_channels=(32, 32),
                    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                    up_block_types=("AttnUpBlock2D", "UpBlock2D")),
    vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
    image_size=(8, 64),
)

TINY_UPSAMPLE = zoo.ModelSpec(
    name="tiny_upsample",
    unet=UNetConfig(sample_size=(4, 32), in_channels=8, out_channels=4,
                    block_out_channels=(32, 32),
                    down_block_types=("DownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "UpBlock2D")),
    vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
    image_size=(8, 64), pos_encoding=False, cond_channels=4,
)

zoo.ZOO["tiny_test"] = lambda: TINY
zoo.ZOO["tiny_upsample"] = lambda: TINY_UPSAMPLE


def batches(rng, n, bs=8, hw=(8, 64), extra=None):
    for _ in range(n):
        b = {"jpg": rng.standard_normal((bs, *hw, 2)).astype(np.float32)}
        if extra == "down":
            b["down"] = b["jpg"][:, 1::2, :, :]
        if extra == "inpaint":
            m = -np.ones((bs, *hw, 1), np.float32)
            m[:, :, :4, :] = 1.0
            b["inpainting_mask"] = m
            b["masked_image"] = np.where(m < 0, b["jpg"], -1.0)
        yield b


@pytest.fixture
def trainer_cfg(tmp_path):
    return Cfg.wrap({
        "model": "tiny_test", "output_dir": str(tmp_path / "run"),
        "train_batch_size": 8, "checkpointing_steps": 3,
        "checkpoints_total_limit": 2, "lr_warmup_steps": 2,
        "use_ema": True, "with_vae": True,
    })


@pytest.mark.heavy
def test_train_checkpoint_resume_pipeline(trainer_cfg, rng, tmp_path):
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu.sample_ldm import load_pipeline, build_sampler, save_outputs
    from rangeldm_tpu.geometry import get_spec

    tr = LdmTrainer(trainer_cfg)
    last = tr.fit(batches(rng, 6), max_steps=6, log_every=1)
    assert np.isfinite(last["loss"])
    assert last["step"] == 6

    # rolling checkpoints: limit 2 -> steps {3, 6}
    ckpts = sorted(glob.glob(os.path.join(
        trainer_cfg.output_dir, "checkpoints", "checkpoint*")))
    assert len(ckpts) == 2

    # resume restores the step counter
    cfg2 = Cfg.wrap(dict(trainer_cfg, resume_from_checkpoint="latest"))
    tr2 = LdmTrainer(cfg2)
    assert tr2.resume() == 6

    # final pipeline artifact
    path = tr.save_final()
    assert os.path.exists(os.path.join(path, "model_index.json"))
    assert os.path.exists(os.path.join(path, "unet", "config.json"))
    assert os.path.isdir(os.path.join(path, "unet_ema"))
    assert os.path.isdir(os.path.join(path, "vae"))

    # reload + sample end-to-end
    pipe = load_pipeline(path, dtype=jnp.float32)
    sampler = build_sampler(pipe, batch_size=2, num_steps=4,
                            dtype=jnp.float32)
    imgs = np.asarray(sampler(jax.random.PRNGKey(0)), np.float32)
    assert imgs.shape == (2, 8, 64, 2)
    assert np.isfinite(imgs).all()

    out = str(tmp_path / "samples")
    # 8-beam synthetic spec matching the tiny model's outputs
    import dataclasses
    spec = get_spec("kitti360")
    tiny_spec = dataclasses.replace(
        spec, n_beams=8, width=64,
        height=spec.height[:8], zenith=spec.zenith[:8],
        grid_sizes=(1, 32, 32))
    save_outputs(imgs, tiny_spec, out, 0)
    assert len(glob.glob(out + "/*.bin")) == 2
    assert len(glob.glob(out + "/*_bev.png")) == 2


@pytest.mark.heavy
def test_train_upsample_conditional(rng, tmp_path):
    from rangeldm_tpu.train_ldm import LdmTrainer
    cfg = Cfg.wrap({
        "model": "tiny_upsample", "output_dir": str(tmp_path / "up"),
        "upsample": 2, "use_ema": False, "with_vae": True,
        "checkpointing_steps": 100, "sample_every_steps": 2,
        "ddpm_num_inference_steps": 3,
    })
    tr = LdmTrainer(cfg)
    last = tr.fit(batches(rng, 3, extra="down"), max_steps=3, log_every=1)
    assert np.isfinite(last["loss"])
    # in-training conditional sample dump from the current batch's
    # conditions (train_conditional.py:542-570 parity): triplet grids
    base = os.path.join(str(tmp_path / "up"), "samples")
    for name in ("result", "target", "input"):
        assert os.path.exists(
            os.path.join(base, f"samples_step00000002_{name}.png")), name


@pytest.mark.heavy
def test_train_inpainting_conditional(rng, tmp_path):
    from rangeldm_tpu.train_ldm import LdmTrainer
    cfg = Cfg.wrap({
        "model": "tiny_upsample", "output_dir": str(tmp_path / "inp"),
        "inpainting": 0.0625, "use_ema": False, "with_vae": True,
        "checkpointing_steps": 100,
    })
    # inpainting cond = 4 latent + 1 mask channels => in 4+5=9
    import dataclasses
    spec = dataclasses.replace(
        TINY_UPSAMPLE,
        unet=dataclasses.replace(TINY_UPSAMPLE.unet, in_channels=9),
        cond_channels=5, name="tiny_inpaint")
    zoo.ZOO["tiny_upsample"] = lambda: spec
    try:
        tr = LdmTrainer(cfg)
        last = tr.fit(batches(rng, 3, extra="inpaint"), max_steps=3,
                      log_every=1)
        assert np.isfinite(last["loss"])
    finally:
        zoo.ZOO["tiny_upsample"] = lambda: TINY_UPSAMPLE


@pytest.mark.heavy
def test_vae_trainer_cli_class(rng, tmp_path):
    from rangeldm_tpu.train_vae import VaeTrainer
    cfg = Cfg.wrap({
        "output_dir": str(tmp_path / "vae"),
        "image_size": (32, 64), "batch_size": 8,
        "vae": {"ch": 32, "ch_mult": (1, 2), "z_channels": 4},
        "loss": {"disc_start": 100, "metakernel": True},
        "log_images_every": 2,
        "checkpoint_every_steps": 2,
    })
    tr = VaeTrainer(cfg)
    last = tr.fit(batches(rng, 3, hw=(32, 64)), max_steps=3, log_every=1)
    assert np.isfinite(last["total_loss"])
    assert np.isfinite(last["disc_loss"])
    import glob as g
    assert g.glob(str(tmp_path / "vae" / "images" / "*.png"))
    path = tr.save_final()
    assert os.path.exists(str(tmp_path / "vae" / "vae_sgm.safetensors"))
    # resume restores step
    tr2 = VaeTrainer(cfg)
    assert tr2.resume() >= 2


@pytest.mark.heavy
def test_sample_dump_during_training(rng, tmp_path):
    from rangeldm_tpu.train_ldm import LdmTrainer
    cfg = Cfg.wrap({
        "model": "tiny_test", "output_dir": str(tmp_path / "dump"),
        "use_ema": True, "with_vae": True,
        "checkpointing_steps": 100, "sample_every_steps": 2,
    })
    tr = LdmTrainer(cfg)
    tr._sample_fn = tr.make_sample_fn(batch_size=2, num_steps=2)
    tr.fit(batches(rng, 2), max_steps=2, log_every=1)
    assert glob.glob(str(tmp_path / "dump" / "samples" / "*.png"))


def test_conditional_sampler_cli_path(rng, tmp_path):
    """Upsample-mode conditional sampling through the pipeline artifact."""
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu.sample_ldm import load_pipeline
    from rangeldm_tpu.sample_conditional import build_conditional_sampler

    cfg = Cfg.wrap({
        "model": "tiny_upsample", "output_dir": str(tmp_path / "cup"),
        "upsample": 2, "use_ema": False, "with_vae": True,
        "checkpointing_steps": 100,
    })
    tr = LdmTrainer(cfg)
    tr.fit(batches(rng, 1, extra="down"), max_steps=1, log_every=1)
    path = tr.save_final()

    pipe = load_pipeline(path, dtype=jnp.float32)
    sampler = build_conditional_sampler(pipe, batch_size=2, mode="upsample",
                                        num_steps=2, factor=2,
                                        dtype=jnp.float32)
    b = next(batches(rng, 1, bs=2, extra="down"))
    out = np.asarray(sampler(jax.random.PRNGKey(0),
                             {"down": jnp.asarray(b["down"])}), np.float32)
    assert out.shape == (2, 8, 64, 2)
    assert np.isfinite(out).all()


def test_conditional_sampler_honors_pos_encoding(rng, tmp_path):
    """A conditional model TRAINED with the pos-encoding channel (inline
    configs default pos_encoding True) must sample offline too: the
    sampler reads meta['pos_encoding'] and concatenates the channel
    (round-3 review fix — it used to drop it and crash on conv_in)."""
    import dataclasses
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu.sample_ldm import load_pipeline
    from rangeldm_tpu.sample_conditional import build_conditional_sampler

    spec = dataclasses.replace(
        TINY_UPSAMPLE,
        unet=dataclasses.replace(TINY_UPSAMPLE.unet, in_channels=9),
        pos_encoding=True, name="tiny_up_pos")
    zoo.ZOO["tiny_up_pos"] = lambda: spec
    cfg = Cfg.wrap({
        "model": "tiny_up_pos", "output_dir": str(tmp_path / "cpp"),
        "upsample": 2, "use_ema": False, "with_vae": True,
        "pos_encoding": True, "checkpointing_steps": 100,
    })
    tr = LdmTrainer(cfg)
    tr.fit(batches(rng, 1, extra="down"), max_steps=1, log_every=1)
    path = tr.save_final()

    pipe = load_pipeline(path, dtype=jnp.float32)
    assert pipe["meta"]["pos_encoding"] is True
    sampler = build_conditional_sampler(pipe, batch_size=2, mode="upsample",
                                        num_steps=2, factor=2,
                                        dtype=jnp.float32)
    b = next(batches(rng, 1, bs=2, extra="down"))
    out = np.asarray(sampler(jax.random.PRNGKey(0),
                             {"down": jnp.asarray(b["down"])}), np.float32)
    assert out.shape == (2, 8, 64, 2) and np.isfinite(out).all()


@pytest.mark.heavy
def test_full_stack_integration(rng, tmp_path):
    """Projection -> VAE latents -> LDM training -> sampling -> inverse
    projection -> BEV histograms -> MMD/JSD: every subsystem wired together
    once."""
    import dataclasses
    from rangeldm_tpu.train_ldm import LdmTrainer
    from rangeldm_tpu.geometry import get_spec, range_image_np, to_point_cloud
    from rangeldm_tpu.metrics.histogram import point_cloud_to_histogram
    from rangeldm_tpu.metrics.mmd import compute_mmd
    from rangeldm_tpu.metrics.jsd import compute_jsd
    from conftest import synthetic_scan

    spec = get_spec("kitti360")
    tiny_spec = dataclasses.replace(
        spec, n_beams=8, width=64, height=spec.height[:8],
        zenith=spec.zenith[:8], grid_sizes=(1, 32, 32))

    # data: project synthetic scans (downsampled to the tiny image)
    imgs = []
    for _ in range(8):
        img, _, _ = range_image_np(synthetic_scan(rng, n=3000), spec)
        imgs.append(img[::8, ::16])          # (8, 64, 2)
    data = np.stack(imgs)

    cfg = Cfg.wrap({"model": "tiny_test", "output_dir": str(tmp_path / "fs"),
                    "use_ema": True, "with_vae": True,
                    "checkpointing_steps": 1000})
    tr = LdmTrainer(cfg)
    tr.fit(iter([{"jpg": data}] * 3), max_steps=3, log_every=1)

    sample_fn = tr.make_sample_fn(batch_size=4, num_steps=3)
    gen = np.asarray(sample_fn(tr.state.ema_params, jax.random.PRNGKey(0)),
                     np.float32)
    assert gen.shape == (4, 8, 64, 2)

    # back-project + metrics
    gen_pc = np.asarray(to_point_cloud(jnp.asarray(gen), tiny_spec))
    dat_pc = np.asarray(to_point_cloud(jnp.asarray(data), tiny_spec))
    gh = [point_cloud_to_histogram(p) for p in gen_pc]
    dh = [point_cloud_to_histogram(p) for p in dat_pc]
    mmd = compute_mmd(dh, gh)
    jsd = compute_jsd(dh, gh)
    assert np.isfinite(mmd) and np.isfinite(jsd)
    assert 0 <= jsd <= 1


@pytest.mark.heavy
def test_vae_validate_live_and_ema(rng, tmp_path):
    from rangeldm_tpu.train_vae import VaeTrainer
    cfg = Cfg.wrap({
        "output_dir": str(tmp_path / "vval"),
        "image_size": (32, 64), "batch_size": 8,
        "vae": {"ch": 32, "ch_mult": (1, 2), "z_channels": 4},
        "loss": {"disc_start": 100, "metakernel": True},
        "checkpoint_every_steps": 100,
    })
    tr = VaeTrainer(cfg)
    tr.fit(batches(rng, 2, hw=(32, 64)), max_steps=2, log_every=1)
    out = tr.validate(batches(rng, 2, hw=(32, 64)), max_batches=2)
    assert np.isfinite(out["val/rec_loss"])
    assert np.isfinite(out["val/rec_loss_ema"])


def test_latent_cache_matches_live_encode(rng, tmp_path):
    """A train step fed precomputed moments must produce exactly the live
    frozen-VAE-encode step's loss for the same RNG (moments are
    deterministic; only the posterior draw is stochastic and shares the
    rng stream), and the disk cache must round-trip + be reused."""
    import dataclasses as dc

    import optax

    from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
    from rangeldm_tpu.models.unet import UNet2D, UNetConfig
    from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
    from rangeldm_tpu.training.latent_cache import (
        MomentsDataset, precompute_moments,
    )
    from rangeldm_tpu.training.ldm_trainer import (
        LdmTrainConfig, make_ldm_train_step,
    )
    from rangeldm_tpu.training.train_state import TrainState

    vcfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
    vae = AutoencoderKL(vcfg)
    imgs = rng.standard_normal((6, 16, 32, 2)).astype(np.float32)
    vp = vae.init({"params": jax.random.PRNGKey(0)}, imgs[:1],
                  rng=jax.random.PRNGKey(1))

    ucfg = UNetConfig(sample_size=(8, 16), in_channels=5, out_channels=4,
                      block_out_channels=(32, 32),
                      down_block_types=("DownBlock2D",) * 2,
                      up_block_types=("UpBlock2D",) * 2)
    unet = UNet2D(ucfg)
    up = unet.init(jax.random.PRNGKey(2),
                   np.zeros((1, 8, 16, 5), np.float32),
                   np.zeros((1,), np.int32))["params"]

    tx = optax.adam(1e-4)
    schedule = Schedule.create(ScheduleConfig(num_train_timesteps=100))
    step = make_ldm_train_step(
        lambda p, x, t: unet.apply({"params": p}, x, t), schedule, tx,
        LdmTrainConfig(),
        vae_apply=lambda p, x: vae.apply(p, x, method="encode_moments"),
        vae_params=vp)

    class Ds:
        def __len__(self):
            return len(imgs)

        def __getitem__(self, i):
            return {"jpg": imgs[i]}

    out = str(tmp_path / "moments.npy")
    moments = precompute_moments(vae, vp, Ds(), batch_size=4, out_path=out,
                                 tag="test")
    assert moments.shape == (6, 8, 16, 8)
    # reuse path: same tag/n -> memmap, no recompute
    again = precompute_moments(vae, vp, Ds(), batch_size=4, out_path=out,
                               tag="test")
    np.testing.assert_array_equal(np.asarray(again), np.asarray(moments))

    # a different dataset identity (same length!) must invalidate the
    # cache even with the same tag/n/shape (ADVICE r2: data fingerprint)
    class DsOther(Ds):
        files = ["other_root/%d.bin" % i for i in range(6)]

        def __getitem__(self, i):
            return {"jpg": imgs[::-1][i]}

    other = precompute_moments(vae, vp, DsOther(), batch_size=4,
                               out_path=out, tag="test")
    np.testing.assert_array_equal(np.asarray(other),
                                  np.asarray(moments)[::-1])

    # a changed projection config over the SAME files must also invalidate
    # (data.mean/std/encoding change the encoded moments; ADVICE r2 +
    # round-3 review)
    from rangeldm_tpu.training.latent_cache import dataset_fingerprint

    class DsCfg(Ds):
        files = list(DsOther.files)
        cfg = "mean=20,std=40"

    class DsCfg2(DsCfg):
        cfg = "mean=50,std=50"

    assert dataset_fingerprint(DsCfg()) != dataset_fingerprint(DsCfg2())
    assert dataset_fingerprint(DsCfg()) == dataset_fingerprint(DsCfg())

    state = TrainState.create(up, tx, with_ema=False)
    key = jax.random.PRNGKey(7)
    _, m_live = step(state, jnp.asarray(imgs[:4]), key)
    _, m_cached = step(
        state, {"moments": jnp.asarray(moments[:4])}, key)
    np.testing.assert_allclose(float(m_cached["loss"]),
                               float(m_live["loss"]), rtol=1e-5)

    ds_view = MomentsDataset(moments)
    assert ds_view[2]["moments"].shape == (8, 16, 8)


def test_latent_cache_with_grad_accum(rng):
    """cache_latents + gradient_accumulation_steps > 1 (regression: the
    accumulation wrapper used to KeyError on moments batches)."""
    import optax

    from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
    from rangeldm_tpu.models.unet import UNet2D, UNetConfig
    from rangeldm_tpu.training.ldm_trainer import (
        LdmTrainConfig, make_ldm_train_step,
    )
    from rangeldm_tpu.training.train_state import TrainState

    ucfg = UNetConfig(sample_size=(8, 16), in_channels=5, out_channels=4,
                      block_out_channels=(32, 32),
                      down_block_types=("DownBlock2D",) * 2,
                      up_block_types=("UpBlock2D",) * 2)
    unet = UNet2D(ucfg)
    up = unet.init(jax.random.PRNGKey(0),
                   np.zeros((1, 8, 16, 5), np.float32),
                   np.zeros((1,), np.int32))["params"]
    tx = optax.adam(1e-4)
    step = make_ldm_train_step(
        lambda p, x, t: unet.apply({"params": p}, x, t),
        Schedule.create(ScheduleConfig(num_train_timesteps=50)), tx,
        LdmTrainConfig(grad_accum_steps=2),
        vae_apply=lambda p, x: x, vae_params={})
    state = TrainState.create(up, tx, with_ema=False)
    moments = jnp.asarray(rng.standard_normal((4, 8, 16, 8)), jnp.float32)
    new_state, metrics = step(state, {"moments": moments},
                              jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_spec_from_cfg_inline_conditional_channels():
    """Inline model_config + upsample/inpainting must derive cond_channels
    (round-3 review: it stayed 0, so the in-training sample dump took the
    unconditional path and crashed on conv_in)."""
    from rangeldm_tpu.train_ldm import spec_from_cfg
    spec = spec_from_cfg(Cfg.wrap({
        "model_config": {
            "sample_size": [256, 16], "in_channels": 12, "out_channels": 4,
            "block_out_channels": [32, 32],
            "down_block_types": ["DownBlock2D", "DownBlock2D"],
            "up_block_types": ["UpBlock2D", "UpBlock2D"]},
        "vae_config": {"ch": 32, "ch_mult": [1, 2], "z_channels": 4},
        "pos_encoding": False, "upsample": 2,
    }))
    assert spec.cond_channels == 8
    spec2 = spec_from_cfg(Cfg.wrap({
        "model_config": {
            "sample_size": [256, 16], "in_channels": 5, "out_channels": 4,
            "block_out_channels": [32, 32],
            "down_block_types": ["DownBlock2D", "DownBlock2D"],
            "up_block_types": ["UpBlock2D", "UpBlock2D"]},
    }))
    assert spec2.cond_channels == 0 and spec2.pos_encoding


def test_upsample_factor_must_match_vae_down_factor(tmp_path):
    """Densification factor != VAE spatial down factor cannot produce a
    condition grid matching the latent; fail fast with a clear error."""
    from rangeldm_tpu.train_ldm import LdmTrainer
    cfg = Cfg.wrap({
        "model": "tiny_upsample", "output_dir": str(tmp_path / "bad"),
        "upsample": 4, "use_ema": False, "with_vae": True,
    })
    with pytest.raises(ValueError, match="down factor"):
        LdmTrainer(cfg)


def test_conditional_dataset_config_honors_artifact(rng, tmp_path):
    """The conditional CLI's dataset must reproduce the TRAINING
    normalization/encoding/width/channels recorded in the artifact — a
    log- or custom-mean/std-trained model fed default-encoded conditions
    silently writes wrong MAE triplets."""
    from rangeldm_tpu.sample_conditional import conditional_dataset_config
    from rangeldm_tpu.models.vae import VaeConfig
    pipe = {
        "meta": {"normalization": {"mean": 50.0, "std": 50.0, "log": True,
                                   "inverse": False}},
        "vae_cfg": VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4,
                             in_channels=2),
        "unet_cfg": TINY_UPSAMPLE.unet,
    }
    dc = conditional_dataset_config(pipe, "/data", "kitti360", "upsample",
                                    factor=2, mask_rate=0.0625)
    assert (dc.mean, dc.std, dc.log, dc.inverse) == (50.0, 50.0, True, False)
    assert dc.width == TINY_UPSAMPLE.unet.sample_size[1] * 2   # vae factor
    assert dc.used_feature == 2
    assert dc.downsample == 2 and dc.inpainting is None
    # HF dirs record nothing -> sensor defaults (None lets the spec decide)
    dc = conditional_dataset_config({"meta": {}, "vae_cfg": pipe["vae_cfg"],
                                     "unet_cfg": pipe["unet_cfg"]},
                                    "/data", "kitti360", "inpainting",
                                    factor=4, mask_rate=0.0625)
    assert dc.mean is None and dc.std is None and dc.log is False
    assert dc.inpainting == 0.0625 and dc.downsample is None
