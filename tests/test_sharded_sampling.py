"""Mesh-sharded inference (VERDICT r3 missing #1): the sampler programs
built with a mesh must (a) produce sample-for-sample identical output to the
single-device programs for the same rng, at any device count, and (b)
actually lay the batch out over the mesh — the TPU equivalent of the
reference's 8-GPU `PartialState` inference sharding
(ldm/inference.py:56,159,174)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rangeldm_tpu.diffusion.schedule import Schedule
from rangeldm_tpu.models.unet import UNet2D, UNetConfig
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.parallel.mesh import make_mesh


def _tiny_pipe(cond_channels=0, pos_encoding=True, with_vae=True):
    """Hand-built pipe dict in the load_pipeline contract (unet/vae modules,
    params, schedule, meta) at toy widths; float32 so sharded-vs-single
    parity is exact on the virtual CPU mesh."""
    in_ch = 4 + cond_channels + (1 if pos_encoding else 0)
    unet_cfg = UNetConfig(sample_size=(4, 32), in_channels=in_ch,
                          out_channels=4, block_out_channels=(32, 32),
                          down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                          up_block_types=("AttnUpBlock2D", "UpBlock2D"))
    unet = UNet2D(unet_cfg, dtype=jnp.float32)
    unet_params = unet.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 4, 32, in_ch), np.float32), np.zeros((1,), np.int32))

    vae = vae_params = vae_cfg = None
    if with_vae:
        vae_cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4)
        vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
        vae_params = vae.init(
            {"params": jax.random.PRNGKey(1)},
            np.zeros((1, 8, 64, 2), np.float32), rng=jax.random.PRNGKey(2))

    return dict(meta={"pos_encoding": pos_encoding, "image_size": [8, 64]},
                unet=unet, unet_cfg=unet_cfg, unet_params=unet_params,
                vae=vae, vae_cfg=vae_cfg, vae_params=vae_params,
                schedule=Schedule.create())


def _assert_batch_sharded(arr, mesh):
    shd = arr.sharding
    assert isinstance(shd, NamedSharding) and shd.mesh.shape == mesh.shape
    assert shd.spec[0] == "data", f"batch axis not sharded: {shd.spec}"
    # each device holds batch/size rows
    db = arr.addressable_shards[0].data.shape[0]
    assert db == arr.shape[0] // mesh.size


@pytest.mark.parametrize("with_vae", [True, False])
def test_build_sampler_mesh_parity(with_vae):
    from rangeldm_tpu.sample_ldm import build_sampler
    pipe = _tiny_pipe(with_vae=with_vae)
    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(7)
    single = build_sampler(pipe, 8, num_steps=3, dtype=jnp.float32)
    sharded = build_sampler(pipe, 8, num_steps=3, dtype=jnp.float32,
                            mesh=mesh)
    ref, got = single(rng), sharded(rng)
    _assert_batch_sharded(got, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_build_sampler_mesh_parity_ddpm():
    """The stochastic (per-step noise) method must also be layout-invariant."""
    from rangeldm_tpu.sample_ldm import build_sampler
    pipe = _tiny_pipe(with_vae=False)
    mesh = make_mesh(4)
    rng = jax.random.PRNGKey(3)
    ref = build_sampler(pipe, 4, num_steps=3, method="ddpm",
                        dtype=jnp.float32)(rng)
    got = build_sampler(pipe, 4, num_steps=3, method="ddpm",
                        dtype=jnp.float32, mesh=mesh)(rng)
    _assert_batch_sharded(got, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_build_conditional_sampler_mesh_parity():
    from rangeldm_tpu.sample_conditional import build_conditional_sampler
    pipe = _tiny_pipe(cond_channels=4, pos_encoding=False)
    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(11)
    down = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 4, 64, 2)).astype(np.float32))
    single = build_conditional_sampler(pipe, 8, "upsample", num_steps=3,
                                       factor=2, dtype=jnp.float32)
    sharded = build_conditional_sampler(pipe, 8, "upsample", num_steps=3,
                                        factor=2, dtype=jnp.float32,
                                        mesh=mesh)
    ref = single(rng, {"down": down})
    got = sharded(rng, {"down": down})
    _assert_batch_sharded(got, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_range_pipeline_mesh_parity():
    from rangeldm_tpu.pipelines import RangePipeline
    pipe_d = _tiny_pipe()
    mesh = make_mesh(8)
    base = RangePipeline(dict(pipe_d), dtype=jnp.float32)
    shard = RangePipeline(dict(pipe_d), dtype=jnp.float32, mesh=mesh)
    a = base(batch_size=8, num_inference_steps=3, seed=5)
    b = shard(batch_size=8, num_inference_steps=3, seed=5)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
    # parity alone cannot prove the mesh was USED (outputs are
    # layout-invariant by design, and the pipeline returns numpy) — the
    # mesh path must have committed the params onto the mesh, once
    leaf = jax.tree.leaves(shard._p["unet_params"])[0]
    assert leaf.sharding.mesh.shape == mesh.shape, leaf.sharding
    assert shard._p.get("_replicated") is True
    assert "_replicated" not in base._p
    # trajectory path also runs mesh-sharded
    img, traj = shard(batch_size=8, num_inference_steps=3, seed=5,
                      final_only=False)
    np.testing.assert_allclose(img, a, rtol=1e-5, atol=1e-5)
    assert traj.shape == (3, 8, 8, 64, 2)


def test_mesh_batch_divisibility_error():
    from rangeldm_tpu.sample_ldm import build_sampler
    pipe = _tiny_pipe(with_vae=False)
    with pytest.raises(ValueError, match="not divisible"):
        build_sampler(pipe, 6, num_steps=2, mesh=make_mesh(8))


def test_resolve_sampling_mesh_policy():
    from rangeldm_tpu.sample_ldm import resolve_sampling_mesh
    # 8 virtual devices: batch 16 -> full mesh; batch 6 -> largest divisor
    m = resolve_sampling_mesh("auto", 16)
    assert m is not None and m.size == 8
    m = resolve_sampling_mesh("auto", 6)
    assert m is not None and m.size == 6
    assert resolve_sampling_mesh("1", 16) is None
    m = resolve_sampling_mesh("4", 16)
    assert m is not None and m.size == 4
    with pytest.raises(ValueError, match="local devices"):
        resolve_sampling_mesh("64", 64)
    # batch 7 on 8 devices: largest divisor <= 8 is 7
    m = resolve_sampling_mesh("auto", 7)
    assert m is not None and m.size == 7


def test_pipe_pos_encoding_heuristic():
    """One centralized default (ADVICE r3 #5): meta wins; without the key,
    in-out==1 means the pos channel (all released unconditional configs),
    anything else means condition channels."""
    from rangeldm_tpu.sample_ldm import pipe_pos_encoding
    p = _tiny_pipe(pos_encoding=True)
    assert pipe_pos_encoding(p) is True
    p = _tiny_pipe(cond_channels=4, pos_encoding=False)
    assert pipe_pos_encoding(p) is False
    # hand-built dict without the meta key
    p = _tiny_pipe(pos_encoding=True)
    del p["meta"]["pos_encoding"]
    assert pipe_pos_encoding(p) is True          # in-out == 1
    p = _tiny_pipe(cond_channels=4, pos_encoding=False)
    del p["meta"]["pos_encoding"]
    assert pipe_pos_encoding(p) is False         # in-out == 4

    # the API's cond-channel accounting uses the same helper
    from rangeldm_tpu.pipelines import RangePipeline
    assert RangePipeline(p).cond_channels == 4


def test_range_pipeline_mesh_auto_adapts_to_batch():
    """mesh='auto' must never make the documented default pipe() raise:
    non-divisible batches adapt to the largest device prefix that divides
    them (the CLI's --mesh_devices auto policy), down to single-device for
    batch 1 — while an explicit Mesh stays strict."""
    from rangeldm_tpu.pipelines import RangePipeline
    pipe_d = _tiny_pipe()
    base = RangePipeline(dict(pipe_d), dtype=jnp.float32)
    auto = RangePipeline(dict(pipe_d), dtype=jnp.float32, mesh=make_mesh(8),
                         mesh_auto=True)
    # batch 1: nothing divides -> single-device, still correct
    np.testing.assert_allclose(
        auto(batch_size=1, num_inference_steps=2, seed=3),
        base(batch_size=1, num_inference_steps=2, seed=3),
        rtol=1e-5, atol=1e-5)
    # batch 6 on 8 devices -> 6-device submesh, same samples
    np.testing.assert_allclose(
        auto(batch_size=6, num_inference_steps=2, seed=3),
        base(batch_size=6, num_inference_steps=2, seed=3),
        rtol=1e-5, atol=1e-5)
    assert 6 in auto._submeshes and auto._submeshes[6].size == 6
    # divisible batch uses the full mesh and stores the replicated params
    np.testing.assert_allclose(
        auto(batch_size=8, num_inference_steps=2, seed=3),
        base(batch_size=8, num_inference_steps=2, seed=3),
        rtol=1e-5, atol=1e-5)
    assert auto._p.get("_replicated") is True
    # explicit Mesh keeps the clear error
    strict = RangePipeline(dict(pipe_d), dtype=jnp.float32, mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        strict(batch_size=6, num_inference_steps=2)


def test_apply_meta_normalization():
    """The artifact's normalization record must override the registry
    sensor defaults at back-projection (a model trained with custom
    mean/std or log encoding mis-scales every cloud under the defaults);
    artifacts without the record (HF-released dirs) pass through."""
    from rangeldm_tpu.geometry import get_spec
    from rangeldm_tpu.sample_ldm import apply_meta_normalization
    spec = get_spec("kitti360")
    out = apply_meta_normalization(
        spec, {"normalization": {"mean": 50.0, "std": 50.0, "log": True,
                                 "inverse": False}})
    assert (out.mean, out.std, out.log, out.inverse) == (50.0, 50.0, True,
                                                         False)
    assert apply_meta_normalization(spec, {}) is spec
    assert apply_meta_normalization(spec, None) is spec
