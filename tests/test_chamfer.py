"""Chamfer distance tests vs a direct numpy evaluation."""

import numpy as np
import jax.numpy as jnp

from rangeldm_tpu.metrics.chamfer import chamfer_distance


def np_chamfer(a, b):
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d2.min(1).mean() + d2.min(0).mean()


def test_chamfer_matches_numpy(rng):
    a = rng.standard_normal((300, 3)).astype(np.float32)
    b = rng.standard_normal((200, 3)).astype(np.float32)
    got = float(chamfer_distance(a, b))
    np.testing.assert_allclose(got, np_chamfer(a, b), rtol=1e-4)


def test_chamfer_identical_zero(rng):
    a = rng.standard_normal((500, 3)).astype(np.float32)
    assert float(chamfer_distance(a, a)) < 1e-5


def test_chamfer_validity_mask(rng):
    a = rng.standard_normal((100, 3)).astype(np.float32)
    b = np.concatenate([a, np.full((50, 3), 100.0, np.float32)])
    bv = np.concatenate([np.ones(100, bool), np.zeros(50, bool)])
    got = float(chamfer_distance(a, b, b_valid=jnp.asarray(bv)))
    assert got < 1e-5  # outliers masked out
