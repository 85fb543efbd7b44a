"""RangePipeline user API: from_pretrained over a saved pipeline dir,
unconditional + conditional generation, point-cloud post-processing
(the DiffusionPipeline-convenience surface of ldm/pipelines.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rangeldm_tpu.models import zoo
from rangeldm_tpu.models.unet import UNetConfig
from rangeldm_tpu.models.vae import VaeConfig
from rangeldm_tpu.utils.config import Cfg


def _make_pipeline_dir(tmp_path, name, spec, cond=None):
    from rangeldm_tpu.train_ldm import LdmTrainer
    zoo.ZOO[name] = lambda: spec
    cfg = {"model": name, "output_dir": str(tmp_path / name),
           "use_ema": False, "with_vae": True, "checkpointing_steps": 100}
    if cond == "upsample":
        cfg["upsample"] = 2
    tr = LdmTrainer(Cfg.wrap(cfg))
    return tr.save_final()


@pytest.mark.heavy
def test_range_pipeline_unconditional_and_clouds(tmp_path):
    from rangeldm_tpu.pipelines import RangePipeline
    spec = zoo.ModelSpec(
        name="api_tiny",
        unet=UNetConfig(sample_size=(4, 32), in_channels=5, out_channels=4,
                        block_out_channels=(32, 32),
                        down_block_types=("DownBlock2D",) * 2,
                        up_block_types=("UpBlock2D",) * 2),
        vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
        image_size=(8, 64))
    path = _make_pipeline_dir(tmp_path, "api_tiny", spec)

    import dataclasses
    from rangeldm_tpu.geometry import get_spec
    base = get_spec("kitti360")
    tiny_spec = dataclasses.replace(
        base, n_beams=8, width=64, height=base.height[:8],
        zenith=base.zenith[:8], grid_sizes=(1, 32, 32))
    pipe = RangePipeline.from_pretrained(path, dtype=jnp.float32,
                                         spec=tiny_spec)
    assert pipe.spec is tiny_spec
    assert pipe.is_latent and pipe.cond_channels == 0
    imgs = pipe(batch_size=2, num_inference_steps=3, seed=0)
    assert imgs.shape == (2, 8, 64, 2) and np.isfinite(imgs).all()
    # deterministic per seed, cached jit reused
    imgs2 = pipe(batch_size=2, num_inference_steps=3, seed=0)
    np.testing.assert_array_equal(imgs, imgs2)

    clouds = pipe.to_point_clouds(imgs)
    assert len(clouds) == 2 and clouds[0].shape[1] == 4

    out = tmp_path / "api_out"
    pipe.save_outputs(imgs, str(out))
    assert (out / "0.bin").exists() and (out / "1_range.png").exists()

    # denoising-trajectory variant (final_only=False, pipelines.py:350-355)
    image, traj = pipe(batch_size=1, num_inference_steps=3, seed=0,
                       final_only=False)
    assert image.shape == (1, 8, 64, 2)
    assert traj.shape == (3, 1, 8, 64, 2)
    assert np.isfinite(traj).all()


@pytest.mark.heavy
def test_range_pipeline_upsample(tmp_path):
    from rangeldm_tpu.pipelines import RangePipeline
    spec = zoo.ModelSpec(
        name="api_up",
        unet=UNetConfig(sample_size=(4, 32), in_channels=8, out_channels=4,
                        block_out_channels=(32, 32),
                        down_block_types=("DownBlock2D",) * 2,
                        up_block_types=("UpBlock2D",) * 2),
        vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
        image_size=(8, 64), pos_encoding=False, cond_channels=4)
    path = _make_pipeline_dir(tmp_path, "api_up", spec, cond="upsample")

    pipe = RangePipeline.from_pretrained(path, dtype=jnp.float32)
    assert pipe.cond_channels == 4
    with pytest.raises(ValueError, match="conditional"):
        pipe(batch_size=2)
    sparse = np.random.default_rng(0).standard_normal(
        (2, 4, 64, 2)).astype(np.float32)
    dense = pipe.upsample(sparse, num_inference_steps=3)
    assert dense.shape == (2, 8, 64, 2) and np.isfinite(dense).all()


@pytest.mark.heavy
def test_range_pipeline_inpaint(tmp_path):
    from rangeldm_tpu.pipelines import RangePipeline
    spec = zoo.ModelSpec(
        name="api_inp",
        unet=UNetConfig(sample_size=(4, 32), in_channels=9, out_channels=4,
                        block_out_channels=(32, 32),
                        down_block_types=("DownBlock2D",) * 2,
                        up_block_types=("UpBlock2D",) * 2),
        vae=VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4),
        image_size=(8, 64), pos_encoding=False, cond_channels=5)
    from rangeldm_tpu.train_ldm import LdmTrainer
    zoo.ZOO["api_inp"] = lambda: spec
    try:
        tr = LdmTrainer(Cfg.wrap({
            "model": "api_inp", "output_dir": str(tmp_path / "api_inp"),
            "inpainting": 0.0625, "use_ema": False, "with_vae": True}))
        path = tr.save_final()
    finally:
        zoo.ZOO.pop("api_inp", None)

    pipe = RangePipeline.from_pretrained(path, dtype=jnp.float32)
    assert pipe.cond_channels == 5
    rng = np.random.default_rng(0)
    masked = rng.standard_normal((2, 8, 64, 2)).astype(np.float32)
    mask = -np.ones((2, 8, 64, 1), np.float32)
    mask[:, :, :4, :] = 1.0
    filled = pipe.inpaint(masked, mask, num_inference_steps=3)
    assert filled.shape == (2, 8, 64, 2) and np.isfinite(filled).all()


def test_pipeline_spec_cached_and_notes_once(capsys):
    """pipe.spec is immutable — compute it once and cache: the reduced-
    resolution stderr note must not repeat on every to_point_clouds()."""
    from rangeldm_tpu.pipelines import RangePipeline

    cfg = UNetConfig(sample_size=(8, 64), in_channels=3, out_channels=2,
                     block_out_channels=(8, 8),
                     down_block_types=("DownBlock2D",) * 2,
                     up_block_types=("UpBlock2D",) * 2)
    pipe = RangePipeline({"unet_cfg": cfg, "vae_cfg": None, "vae": None,
                          "meta": {}}, dtype=jnp.float32)
    s1 = pipe.spec
    assert pipe.spec is s1
    assert capsys.readouterr().err.count("note:") == 1

    # mutating the public `sensor` attribute invalidates the cached spec
    # (ADVICE r4) — the next access re-derives it for the new sensor
    pipe.sensor = "nuscenes"
    s2 = pipe.spec
    assert s2 is not s1
    # (still reduced to the 8x64 model resolution, but nuScenes semantics)
    assert s2.name == "nuscenes" and s2.mean == 50.0
    pipe.sensor = "nuscenes"   # same value: no invalidation
    assert pipe.spec is s2
