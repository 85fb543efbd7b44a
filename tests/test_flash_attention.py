"""Fused-attention kernel parity vs the reference einsum path (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeldm_tpu.models.layers import attention_mh
from rangeldm_tpu.ops.attention import attention_mh_fused, fused_attention


def test_fused_attention_matches_reference(rng):
    q = jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32))
    got = np.asarray(fused_attention(q, k, v, interpret=True))
    expect = np.asarray(attention_mh(
        q.reshape(4, 64, 8), k.reshape(4, 64, 8), v.reshape(4, 64, 8),
        n_heads=1))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_fused_multihead_matches_reference(rng):
    b, t, c, heads = 2, 32, 64, 8
    q = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    got = np.asarray(attention_mh_fused(q, k, v, heads, interpret=True))
    expect = np.asarray(attention_mh(q, k, v, heads))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16(rng):
    q = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.bfloat16)
    got = fused_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    expect = attention_mh(q, k, v, 1)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_backward_reference_matches_einsum_grad(rng):
    """The custom-VJP backward recomputes via _plain_attention_t; its grads
    must equal the einsum path's grads."""
    from rangeldm_tpu.ops.attention import _plain_attention_t

    q = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    scale = 8 ** -0.5

    def loss_t(q, k, v):
        return jnp.sum(_plain_attention_t(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        qq, kk, vv = (u.swapaxes(1, 2) for u in (q, k, v))
        o = attention_mh(qq, kk, vv, 1)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_backward_kernel_matches_autodiff(rng):
    """The backward kernel's (dq, dk, dv) must equal autodiff through the
    plain transposed attention (interpret mode)."""
    from rangeldm_tpu.ops.attention import (
        _plain_attention_t, fused_attention_bwd_t,
    )
    qt = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
    kt = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
    vt = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
    scale = 8 ** -0.5

    _, vjp = jax.vjp(lambda a, b, c: _plain_attention_t(a, b, c, scale),
                     qt, kt, vt)
    expect = vjp(g)
    got = fused_attention_bwd_t(qt, kt, vt, g, scale, interpret=True)
    for a, b in zip(got, expect):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
