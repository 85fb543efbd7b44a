"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding paths are exercised
without TPU hardware (the driver separately dry-runs multi-chip compilation).
Must set flags before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox pins jax_platforms to 'axon,cpu'; force pure CPU for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def synthetic_scan(rng, n=20000, n_beams=64, with_ring=False):
    """A plausible synthetic LiDAR scan: points on random azimuths/radii with
    z in the sensor's vertical field of view."""
    azi = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2.5, 80.0, n)
    zen = rng.uniform(-0.43, 0.03, n)
    x = r * np.cos(zen) * np.cos(azi)
    y = r * np.cos(zen) * np.sin(azi)
    z = r * np.sin(zen)
    intensity = rng.uniform(0, 1, n)
    cols = [x, y, z, intensity]
    if with_ring:
        cols.append(rng.integers(0, n_beams, n).astype(np.float64))
    return np.stack(cols, axis=1).astype(np.float32)


@pytest.fixture
def scan(rng):
    return synthetic_scan(rng)
