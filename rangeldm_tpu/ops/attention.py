"""Pallas fused attention for the UNet's small-head attention blocks.

The diffusers deprecated-AttnBlock configuration (head_dim=8, heads=C/8) is
pathological for materialized-logits attention on TPU: at the 8x128 latent
level the (B, 16, 1024, 1024) score tensor costs ~GBs of HBM traffic per
layer, making attention ~80% of the UNet forward (measured 35.2ms with vs
6.97ms without at batch 32). FLOPs are irrelevant — the padded-contraction
matmuls are cheap — so the win is fusion: with T <= ~2048 a (T, T) score
matrix fits VMEM and the kernel computes scores -> f32 softmax -> output
without touching HBM.

Layout notes (why the kernel takes (N, D, T) transposed inputs):
  * a (T, 8) block puts 8 in the lane dimension -> physically padded to
    (T, 128), 16x VMEM waste; transposing to (8, T) makes T the lane dim.
  * one grid step per (batch*head) is 512 tiny steps whose fixed overhead
    dominates; we process `group` heads per step with an unrolled loop.

Numerics: the softmax MAX/logit arithmetic is f32, but the exponentials,
the PV matmul, and the appended-ones-row denominator run in the COMPUTE
dtype (e is cast to v_ref.dtype before the matmul) — so under bf16 the
probabilities/denominator are bf16, not f32. f32-in-f32-out matches
models/layers.attention_mh to f32 tolerances (tests/test_flash_attention.py);
bf16 runs should be compared at bf16 tolerances (the UNet's parity tests
do — models/unet.py notes the same deviation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# XLA-vs-Pallas crossover: sequences at or below this length route to the
# materialized-scores einsum path (grid-overhead-bound in the kernel;
# measured 0.36 vs 0.44 ms for the six T=64 layers chained, BENCHMARKS.md).
# The ONE tunable shared by attention_mh_fused and models/unet.Attention —
# re-tune it here, never fork the literal.
XLA_EINSUM_MAX_T = 64


_LOG2E = float(np.log2(np.e))


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, group: int):
    # Per head: scores[t, s] = sum_d q[d, t] k[d, s]; the softmax temperature
    # is folded into scale as log2(e) so the exponential is a single exp2
    # (exp(x) == exp2(x * log2e)).
    #
    # Two MXU-economics tricks (see BENCHMARKS.md):
    #  * software pipelining: head g+1's QK^T (MXU) is issued *before* head
    #    g's softmax (VPU), so the d=8-padded contraction and the exp2 pass
    #    overlap instead of serializing — the kernel runs at
    #    max(MXU, VPU) instead of MXU + VPU.
    #  * the softmax row-sum rides the PV matmul: V is augmented with a ones
    #    row, so row D of the (D+1, T) product is sum_s e[t, s]. The MXU pads
    #    the 8-row output to a full tile anyway, making the sum literally
    #    free, and it replaces a full (T, T) VPU reduction pass per head.
    def qk(g):
        return jax.lax.dot_general(
            q_ref[g], k_ref[g], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * _LOG2E)

    d = q_ref.shape[1]
    ones = jnp.ones((1, v_ref.shape[2]), v_ref.dtype)
    l_next = qk(0)
    for g in range(group):
        logits = l_next
        if g + 1 < group:
            l_next = qk(g + 1)                       # independent MXU work
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2(logits - m).astype(v_ref.dtype)         # (T, T)
        v1 = jnp.concatenate([v_ref[g], ones], axis=0)       # (D+1, T)
        # out1[i, t] = sum_s v1[i, s] e[t, s]; row D is the softmax row-sum.
        o = jax.lax.dot_general(
            v1, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (D+1, T)
        o_ref[g] = (o[:d] / o[d:d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "group"))
def fused_attention_t(qt: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
                      scale: float | None = None,
                      interpret: bool = False,
                      group: int = 16) -> jnp.ndarray:
    """(N, D, T) transposed q/k/v -> (N, D, T) attention output."""
    n, d, t = qt.shape
    while n % group:
        group //= 2
    scale = float(d ** -0.5) if scale is None else float(scale)
    kernel = functools.partial(_attn_kernel, scale=scale, group=group)
    spec = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        interpret=interpret,
    )(qt, kt, vt)


def _plain_attention_t(qt, kt, vt, scale):
    """Reference math on the transposed layout (parity target for the
    kernels)."""
    logits = jnp.einsum("ndt,nds->nts", qt, kt).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
    return jnp.einsum("nds,nts->ndt", vt, p)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, group: int):
    """Fused backward on the (D, T) transposed layout.

    Math (p = softmax(scale * q^T k)):
      dv = g p ; dp = g^T v ; dl = p*(dp - rowsum(dp*p)) ; dq = scale*k dl^T ;
      dk = scale*q dl.

    p is never materialized: with e = exp(l - m) and inv_s the softmax
    denominators, dv = dot(g * inv_s^T, e) (the rowwise 1/s applied to the
    tiny (D, T) cotangent instead of the (T, S) probabilities) and
    dl = e*(dp - c)*inv_s*scale with c = rowsum(dp*e)*inv_s. That is two
    (T, S) VPU passes instead of four. The head-independent QK^T of head
    i+1 is issued before head i's softmax so MXU and VPU overlap, as in
    the forward kernel (only QK is prefetched — one more live (T, S) f32
    buffer busts the 16 MB scoped-VMEM stack at T=1024; e is kept in the
    compute dtype for the same reason)."""
    def qk(i):
        return jax.lax.dot_general(
            q_ref[i], k_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * _LOG2E)

    l_next = qk(0)
    for i in range(group):
        logits = l_next
        if i + 1 < group:
            l_next = qk(i + 1)
        dp = jax.lax.dot_general(
            g_ref[i], v_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (T, S)
        m = jnp.max(logits, axis=-1, keepdims=True)
        eb = jnp.exp2(logits - m).astype(v_ref.dtype)        # (T, S)
        inv_s = 1.0 / jnp.sum(eb.astype(jnp.float32), axis=-1, keepdims=True)
        gp = (g_ref[i].astype(jnp.float32)
              * inv_s.reshape(1, -1)).astype(g_ref.dtype)    # (D, T)
        dv = jax.lax.dot_general(
            gp, eb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (D, S)
        ef = eb.astype(jnp.float32)
        c = jnp.sum(dp * ef, axis=-1, keepdims=True) * inv_s
        dl = ((ef * (dp - c)) * (inv_s * scale)).astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            k_ref[i], dl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (D, T)
        dk = jax.lax.dot_general(
            q_ref[i], dl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (D, S)
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "group"))
def fused_attention_bwd_t(qt, kt, vt, g, scale: float,
                          interpret: bool = False, group: int = 16):
    n, d, t = qt.shape
    while n % group:
        group //= 2
    kernel = functools.partial(_attn_bwd_kernel, scale=float(scale),
                               group=group)
    spec = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct(qt.shape, qt.dtype)] * 3
    return pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=shapes,
        interpret=interpret,
    )(qt, kt, vt, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_ad(qt, kt, vt, scale):
    return fused_attention_t(qt, kt, vt, scale=scale)


def _fused_ad_fwd(qt, kt, vt, scale):
    return fused_attention_t(qt, kt, vt, scale=scale), (qt, kt, vt)


def _fused_ad_bwd(scale, res, g):
    qt, kt, vt = res
    return tuple(fused_attention_bwd_t(qt, kt, vt, g, scale))


_fused_attention_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(N, T, D) q/k/v -> (N, T, D). Scale is D^-0.5 on the unpadded head
    dim, matching SDPA."""
    d = q.shape[-1]
    qt, kt, vt = (u.swapaxes(1, 2) for u in (q, k, v))
    ot = fused_attention_t(qt, kt, vt, scale=d ** -0.5, interpret=interpret)
    return ot.swapaxes(1, 2)


def attention_mh_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       n_heads: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for layers.attention_mh using the fused kernel.
    q/k/v: (B, T, C) with C = n_heads * head_dim."""
    b, t, c = q.shape
    hd = c // n_heads
    if t <= XLA_EINSUM_MAX_T:
        # tiny sequences are kernel-grid-overhead-bound; the materialized
        # (B*H, T, T) scores are small enough to stay VMEM-resident and XLA
        # wins (measured 0.36 vs 0.44 ms for the six T=64 layers chained,
        # BENCHMARKS.md). Also keeps autodiff on the native path.
        from rangeldm_tpu.models.layers import attention_mh
        return attention_mh(q, k, v, n_heads)

    def split_t(u):
        # (B, T, C) -> (B*H, D, T)
        return (u.reshape(b, t, n_heads, hd).transpose(0, 2, 3, 1)
                .reshape(b * n_heads, hd, t))

    if interpret:
        ot = fused_attention_t(split_t(q), split_t(k), split_t(v),
                               scale=hd ** -0.5, interpret=True)
    else:
        ot = _fused_attention_ad(split_t(q), split_t(k), split_t(v),
                                 float(hd ** -0.5))
    return (ot.reshape(b, n_heads, hd, t).transpose(0, 3, 1, 2)
            .reshape(b, t, c))
