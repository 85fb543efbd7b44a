"""Mesh / batch-sharding helpers on the 8-device virtual CPU mesh."""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rangeldm_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicate, shard_batch,
)


def test_shard_batch_places_global_array(rng):
    mesh = make_mesh()
    batch = {"jpg": rng.standard_normal((8, 4, 16, 2), dtype=np.float32),
             "mask": rng.standard_normal((8, 4, 16), dtype=np.float32)}
    out = shard_batch(mesh, batch)
    assert out["jpg"].shape == (8, 4, 16, 2)
    assert out["jpg"].sharding == data_sharding(mesh, 4)
    assert out["mask"].sharding == data_sharding(mesh, 3)
    np.testing.assert_array_equal(np.asarray(out["jpg"]), batch["jpg"])
    # each of the 8 devices holds exactly one batch row
    assert all(s.data.shape[0] == 1 for s in out["jpg"].addressable_shards)


def test_process_local_assembly_matches_device_put(rng):
    """The multi-host branch's primitive: make_array_from_process_local_data
    builds the same global array as device_put in the 1-process case (where
    the local slice IS the global batch)."""
    mesh = make_mesh()
    x = rng.standard_normal((8, 6), dtype=np.float32)
    sh = NamedSharding(mesh, P("data", None))
    a = jax.make_array_from_process_local_data(sh, x)
    b = jax.device_put(x, sh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replicate(rng):
    mesh = make_mesh()
    tree = {"w": rng.standard_normal((4, 4), dtype=np.float32)}
    out = replicate(mesh, tree)
    assert out["w"].sharding == NamedSharding(mesh, P())


def test_largest_divisible_prefix():
    """The ONE 'auto' inference-mesh policy (shared by the sampling CLI and
    RangePipeline): largest k <= n_local dividing the batch, floor 1."""
    from rangeldm_tpu.parallel.mesh import largest_divisible_prefix

    assert largest_divisible_prefix(8, 16) == 8
    assert largest_divisible_prefix(8, 6) == 6
    assert largest_divisible_prefix(4, 9) == 3
    assert largest_divisible_prefix(8, 7) == 7
    assert largest_divisible_prefix(8, 1) == 1
    assert largest_divisible_prefix(1, 5) == 1
