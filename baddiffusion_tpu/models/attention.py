"""Legacy-DDPM spatial self-attention block (NHWC).

Behavioral contract: reference `models/attention.py:33-180` (`AttentionBlock`):
GroupNorm → q/k/v linear over flattened H·W tokens → scaled dot-product →
proj → residual add / rescale. Softmax accumulates in f32 (the reference
upcasts attention scores the same way).

TPU note: sequence length is ≤1024 (32² tokens) so a single fused einsum
attention maps cleanly onto the MXU; no blockwise kernel is needed here. A
Pallas fused variant can slot in behind the same module interface later.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from baddiffusion_tpu.models.resnet import GroupNorm


class AttentionBlock(nn.Module):
    channels: int
    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    rescale_output_factor: float = 1.0
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        num_heads = c // self.num_head_channels if self.num_head_channels is not None else 1
        head_dim = c // num_heads

        residual = x
        hidden = GroupNorm(self.norm_num_groups, self.eps, dtype=self.dtype, name="group_norm")(x)
        hidden = hidden.reshape(b, h * w, c)

        q = nn.Dense(c, dtype=self.dtype, name="query")(hidden)
        k = nn.Dense(c, dtype=self.dtype, name="key")(hidden)
        v = nn.Dense(c, dtype=self.dtype, name="value")(hidden)

        # [b, heads, t, head_dim]
        q = q.reshape(b, h * w, num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, h * w, num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, h * w, num_heads, head_dim).transpose(0, 2, 1, 3)

        scale = 1.0 / (float(head_dim) ** 0.5)
        # dispatches to the fused Pallas kernel where it measured faster,
        # XLA einsum elsewhere (ops/attention.py)
        from baddiffusion_tpu.ops.attention import attention

        attn = attention(q, k, v, scale)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, h * w, c)

        out = nn.Dense(c, dtype=self.dtype, name="proj_attn")(attn)
        out = out.reshape(b, h, w, c)
        return (out + residual) / self.rescale_output_factor
