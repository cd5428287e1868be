"""Pallas TPU kernel: fused scaled-dot-product self-attention.

The UNet's attention operates on flattened spatial tokens — at most 32²=1024
(CIFAR) or 16²=256 (256px models' attention resolutions), head dims 8-512
(SURVEY.md §5.7). A whole (scores → softmax → weighted sum) per head fits
VMEM, so a single-block kernel computes attention in one pass: one HBM read
of q/k/v, one write of the output, no materialized [T,T] score tensor in HBM.
No blockwise/flash tiling is needed at these sequence lengths.

Backward: custom VJP recomputing through the jnp reference (XLA autodiff),
same correctness-first pattern as ops/groupnorm.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale: float):
    """jnp reference: softmax(q·kᵀ·scale)·v over [B, H, T, D] (f32 softmax)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [T, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [T, T]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _forward_pallas(q, k, v, scale: float):
    b, h, t, d = q.shape
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    out = pl.pallas_call(
        partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    return _forward_pallas(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _forward_pallas(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: attention_reference(a, b, c, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def attention(q, k, v, scale: float):
    """Dispatching entry point: Pallas single-block attention on TPU where it
    measured faster (v5e: +20% at (16,1,1024,128), +53% at (64,8,256,64),
    ~par at (8,1,1024,512), −27% at (64,1,256,512)) — i.e. head_dim ≤ 128;
    XLA reference otherwise."""
    b, h, t, d = q.shape
    vmem_bytes = (3 * t * d + t * t + t * d) * 4
    if (
        jax.default_backend() == "tpu"
        and vmem_bytes <= 8 * 1024 * 1024
        and t >= 256
        and d <= 128
    ):
        return fused_attention(q, k, v, scale)
    return attention_reference(q, k, v, scale)
