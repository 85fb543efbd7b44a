"""Chamfer distance between point clouds (pytorch3d-equivalent).

Used by the VAE reconstruction eval (ldm/convert_vae.py:262-270).
pytorch3d's `chamfer_distance` returns mean_A min ||a-b||^2 +
mean_B min ||b-a||^2 (squared distances, summed over both directions).
Brute-force pairwise mins, chunked over the first set so 65k x 65k never
materializes; runs as one lax.scan on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def _one_sided(a: jnp.ndarray, b: jnp.ndarray, a_valid, b_valid,
               chunk: int = 4096) -> jnp.ndarray:
    """mean over valid a of min over valid b of ||a-b||^2."""
    n = a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    av_p = jnp.pad(a_valid, (0, pad))
    a_c = a_p.reshape(-1, chunk, 3)
    av_c = av_p.reshape(-1, chunk)
    b_sq = jnp.sum(b * b, axis=1)
    big = jnp.float32(1e30)

    def body(carry, xs):
        ac, avc = xs
        d2 = (jnp.sum(ac * ac, axis=1)[:, None] + b_sq[None, :]
              - 2.0 * ac @ b.T)
        d2 = jnp.where(b_valid[None, :], d2, big)
        mins = jnp.min(d2, axis=1)
        s = jnp.sum(jnp.where(avc, jnp.maximum(mins, 0.0), 0.0))
        return carry + s, None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (a_c, av_c))
    # a side with ZERO valid points has no defined chamfer: the min over
    # an all-masked b would be the 1e30 sentinel, silently poisoning any
    # averaged metric — surface NaN instead (visible in every sink)
    ok = (jnp.sum(a_valid) > 0) & (jnp.sum(b_valid) > 0)
    return jnp.where(ok, total / jnp.maximum(jnp.sum(a_valid), 1),
                     jnp.float32(jnp.nan))


def chamfer_distance(a, b, a_valid=None, b_valid=None) -> jnp.ndarray:
    """Symmetric squared chamfer distance between (N,3) and (M,3)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a_valid is None:
        a_valid = jnp.ones(a.shape[0], bool)
    if b_valid is None:
        b_valid = jnp.ones(b.shape[0], bool)
    return _one_sided(a, b, a_valid, b_valid) + _one_sided(b, a, b_valid,
                                                           a_valid)
