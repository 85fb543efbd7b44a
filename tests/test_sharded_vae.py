"""Azimuth-sharded VAE forward parity (VERDICT r2 next-step #7).

The FULL decoder and encoder run with activations W-sharded over the
8-device virtual mesh via shard_map — every circular conv through halo
exchange, GroupNorm stats psum-reduced, asymmetric stride-2 downsample and
nearest-2x upsample handled — and must match the single-device
`AutoencoderKL.apply` forward.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.parallel.sharded_vae import (
    sharded_vae_decode, sharded_vae_encode,
)
from rangeldm_tpu.parallel.spatial import spatial_sharding


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


@pytest.fixture(scope="module")
def vae_setup():
    cfg = VaeConfig(ch=32, ch_mult=(1, 2, 4), z_channels=4)
    vae = AutoencoderKL(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 128, 2)), jnp.float32)
    params = vae.init({"params": jax.random.PRNGKey(0)}, x,
                      rng=jax.random.PRNGKey(1))["params"]
    return cfg, vae, params, x


@pytest.mark.heavy
def test_sharded_decoder_matches_single_device(vae_setup):
    cfg, vae, params, _ = vae_setup
    mesh = _mesh()
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((2, 4, 32, 4)), jnp.float32)

    want = np.asarray(vae.apply({"params": params}, z, method="decode"))
    zs = jax.device_put(z, spatial_sharding(mesh))
    got = np.asarray(jax.jit(
        lambda zz: sharded_vae_decode(cfg, params, zz, mesh))(zs))
    assert got.shape == want.shape == (2, 16, 128, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_sharded_encoder_matches_single_device(vae_setup):
    cfg, vae, params, x = vae_setup
    mesh = _mesh()
    want = np.asarray(vae.apply({"params": params}, x,
                                method="encode_moments"))
    xs = jax.device_put(x, spatial_sharding(mesh))
    got = np.asarray(jax.jit(
        lambda xx: sharded_vae_encode(cfg, params, xx, mesh))(xs))
    assert got.shape == want.shape == (2, 4, 32, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_sharded_decoder_channel_change_and_quant(vae_setup):
    """ch_mult (1,2) config with use_quant_conv exercises the 1x1
    post_quant path and nin_shortcut channel changes under sharding."""
    cfg = VaeConfig(ch=32, ch_mult=(1, 2), z_channels=4, use_quant_conv=True)
    vae = AutoencoderKL(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 2)), jnp.float32)
    params = vae.init({"params": jax.random.PRNGKey(3)}, x,
                      rng=jax.random.PRNGKey(4))["params"]
    z = jnp.asarray(rng.standard_normal((1, 4, 32, 4)), jnp.float32)
    mesh = _mesh()

    want = np.asarray(vae.apply({"params": params}, z, method="decode"))
    got = np.asarray(jax.jit(lambda zz: sharded_vae_decode(
        cfg, params, zz, mesh))(jax.device_put(z, spatial_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    want_m = np.asarray(vae.apply({"params": params}, x,
                                  method="encode_moments"))
    got_m = np.asarray(jax.jit(lambda xx: sharded_vae_encode(
        cfg, params, xx, mesh))(jax.device_put(x, spatial_sharding(mesh))))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5, atol=1e-5)


def test_unsupported_configs_raise(vae_setup):
    cfg, _, params, _ = vae_setup
    import dataclasses
    bad = dataclasses.replace(cfg, attn_type="vanilla")
    with pytest.raises(NotImplementedError):
        sharded_vae_decode(bad, params, jnp.zeros((1, 4, 32, 4)), _mesh())
    # circular=False must refuse: the ring halo exchange IS wrap padding,
    # so a zero-padded-azimuth VAE would silently diverge at shard edges
    noncirc = dataclasses.replace(cfg, circular=False)
    with pytest.raises(NotImplementedError, match="circular"):
        sharded_vae_decode(noncirc, params, jnp.zeros((1, 4, 32, 4)),
                           _mesh())
    # encoder width validation: local W must divide by the down factor —
    # an odd local width would stride-phase-misalign the (0,1)-halo
    # downsample and return a silently wrong-width result (ADVICE r3)
    with pytest.raises(ValueError, match="down factor"):
        sharded_vae_encode(cfg, params, jnp.zeros((1, 16, 120, 2)), _mesh())
    with pytest.raises(ValueError, match="down factor"):
        # divisible by n_shards (8*13=104) but 13 not by down factor 4
        sharded_vae_encode(cfg, params, jnp.zeros((1, 16, 104, 2)), _mesh())


@pytest.mark.heavy
def test_waymo_scale_sharded_decode(vae_setup):
    """The concrete Waymo-scale claim (SURVEY section 5 long-context;
    ldm/inference.py:169-170 crops 2650-column images): decode a
    2656-azimuth latent with activations W-sharded over 8 devices (332
    columns per shard at the finest level) and match the single-device
    forward."""
    cfg, vae, params, _ = vae_setup
    mesh = _mesh()
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 4, 664, 4)), jnp.float32)

    want = np.asarray(vae.apply({"params": params}, z, method="decode"))
    got = np.asarray(jax.jit(lambda zz: sharded_vae_decode(
        cfg, params, zz, mesh))(jax.device_put(z, spatial_sharding(mesh))))
    assert got.shape == want.shape == (1, 16, 2656, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
