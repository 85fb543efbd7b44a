"""Azimuth-ring spatial parallelism: sharded circular conv must equal the
single-device CircularConv bit-for-bit on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rangeldm_tpu.models.layers import CircularConv
from rangeldm_tpu.parallel.spatial import (
    halo_exchange_w, sharded_circular_conv2d, spatial_sharding,
)


def make_mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


def test_halo_exchange_is_circular(rng):
    mesh = make_mesh()
    x = jnp.asarray(rng.standard_normal((1, 4, 64, 3)).astype(np.float32))
    xs = jax.device_put(x, spatial_sharding(mesh))

    from rangeldm_tpu.parallel.spatial import shard_map
    f = shard_map(lambda v: halo_exchange_w(v, 1, 1, "sp"), mesh=mesh,
                  in_specs=P(None, None, "sp", None),
                  out_specs=P(None, None, "sp", None))
    out = np.asarray(f(xs))
    # each shard of 8 columns becomes 10; globally W = 80
    assert out.shape == (1, 4, 80, 3)
    xn = np.asarray(x)
    for s in range(8):
        blk = out[:, :, s * 10:(s + 1) * 10]
        lo = (s * 8 - 1) % 64
        np.testing.assert_array_equal(blk[:, :, 0], xn[:, :, lo])
        np.testing.assert_array_equal(blk[:, :, 1:9], xn[:, :, s * 8:(s + 1) * 8])
        np.testing.assert_array_equal(blk[:, :, 9], xn[:, :, ((s + 1) * 8) % 64])


def test_sharded_conv_matches_unsharded(rng):
    mesh = make_mesh()
    x = jnp.asarray(rng.standard_normal((2, 8, 64, 6)).astype(np.float32))
    m = CircularConv(10, 3, 1, 1, circular=True)
    params = m.init(jax.random.PRNGKey(0), x)
    expect = np.asarray(m.apply(params, x))

    xs = jax.device_put(x, spatial_sharding(mesh))
    got = sharded_circular_conv2d(
        xs, params["params"]["kernel"], params["params"]["bias"], mesh)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-6)


def test_sharded_strided_conv(rng):
    """Stride-2 downsampling conv with symmetric halos (the UNet's
    Downsample2D pattern)."""
    mesh = make_mesh()
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 4)).astype(np.float32))
    m = CircularConv(8, 3, 2, 1, circular=True)
    params = m.init(jax.random.PRNGKey(1), x)
    expect = np.asarray(m.apply(params, x))

    xs = jax.device_put(x, spatial_sharding(mesh))
    got = sharded_circular_conv2d(
        xs, params["params"]["kernel"], params["params"]["bias"], mesh,
        strides=(2, 2), w_halo=(1, 0))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-6)
