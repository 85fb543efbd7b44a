"""Spatial (sequence) parallelism over the circular azimuth axis.

The reference needs none of this at 64x1024 (SURVEY.md section 5
long-context), but its vestigial Waymo path (2650-row images,
ldm/inference.py:169-170) motivates the idiomatic TPU extension: shard the
azimuth ring over the device mesh and exchange 1-pixel halos with
`lax.ppermute` — the circular axis maps exactly onto the ICI ring, so the
wrap padding that is a `jnp.roll` on one chip becomes a neighbour exchange
with zero extra cost structure.

`sharded_circular_conv2d` reproduces CircularConv's semantics (wrap on W,
zeros on H) for a W-sharded activation; `halo_exchange_w` is the reusable
collective. Validated against the unsharded op on the virtual CPU mesh
(tests/test_spatial_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange_w(x: jnp.ndarray, lo: int, hi: int,
                    axis_name: str) -> jnp.ndarray:
    """Per-shard (B, H, W_shard, C) -> (B, H, lo + W_shard + hi, C) with
    halos fetched from ring neighbours (wrap-around included, so the global
    result is circular padding)."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if lo:
        # my left halo = right edge of my left neighbour: shift right edges
        # one step to the right around the ring
        left = jax.lax.ppermute(
            x[:, :, -lo:], axis_name,
            [(i, (i + 1) % n) for i in range(n)])
        parts.append(left)
    parts.append(x)
    if hi:
        right = jax.lax.ppermute(
            x[:, :, :hi], axis_name,
            [(i, (i - 1) % n) for i in range(n)])
        parts.append(right)
    return jnp.concatenate(parts, axis=2)


def halo_conv_local(xs: jnp.ndarray, kernel: jnp.ndarray, bias,
                    axis: str, strides: Tuple[int, int] = (1, 1),
                    h_pad: Tuple[int, int] = (1, 1),
                    w_halo: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """Shard-local body of the halo-exchange circular conv: the one copy
    of {halo exchange, zero-padded-H conv, bias} that both the standalone
    collective below and parallel/sharded_vae's full-model forwards use
    (padding/stride fixes happen exactly once)."""
    xs = halo_exchange_w(xs, w_halo[0], w_halo[1], axis)
    y = jax.lax.conv_general_dilated(
        xs, kernel, window_strides=strides,
        padding=(h_pad, (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    return y


def sharded_circular_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray | None,
                            mesh: Mesh, axis: str = "sp",
                            strides: Tuple[int, int] = (1, 1),
                            h_pad: Tuple[int, int] = (1, 1),
                            w_halo: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """CircularConv equivalent with x sharded (B, H, W/axis, C) on `axis`.

    kernel: HWIO (replicated). Requires W_shard % strides[1] == 0 and the
    usual 'SAME'-style relation between kernel, halo and stride so shard
    boundaries land on output pixels.
    """
    def local(xs, k, b):
        return halo_conv_local(xs, k, b, axis, strides, h_pad, w_halo)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(), P()),
        out_specs=P(None, None, axis, None),
    )(x, kernel, bias)


def spatial_sharding(mesh: Mesh, axis: str = "sp") -> NamedSharding:
    """(B, H, W, C) activation sharded on W."""
    return NamedSharding(mesh, P(None, None, axis, None))
