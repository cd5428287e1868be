"""Pallas TPU kernel: fused GroupNorm + SiLU.

The UNet spends ~45 GroupNorm→SiLU pairs per step on [B,H,W,C] activations;
each is HBM-bandwidth-bound. This kernel performs statistics, normalization,
affine and SiLU in one VMEM pass per batch row (one HBM read + one write),
where the unfused form costs extra passes for the f32 statistic reductions.

Mosaic-friendly layout choices: channels stay on the lane axis end-to-end —
group statistics are computed as per-channel reductions aggregated through a
one-hot [C, G] matmul (lane-splitting reshapes like [H,W,C]→[HW,G,C/G] are
not supported by the TPU vector layout pass).

Backward: custom VJP that recomputes through the jnp reference implementation
(XLA-fused, numerically identical) — correctness first, forward-path savings
retained.

Status: DELIBERATELY NOT wired into the UNet modules. Measured end-to-end on
v5e, the kernel wins only in isolated forward passes (2.4× at 16²×256); inside
the training graph it regresses throughput (3776→2917 samples/s) because the
VJP recompute and the broken producer-consumer fusion outweigh the forward
saving. It remains available (``ops.groupnorm_silu`` / ``GroupNormSiLU``) for
inference-only integrations; revisit with a hand-written backward kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def groupnorm_silu_reference(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """jnp reference (matches models/resnet.py GroupNorm + SiLU)."""
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    grouped = x32.reshape(b, h, w, num_groups, c // num_groups)
    red = (1, 2, 4)
    mean = jnp.mean(grouped, axis=red, keepdims=True)
    mean_sq = jnp.mean(jnp.square(grouped), axis=red, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    normed = ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = normed * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, gmat_ref, out_ref, *, num_groups: int, eps: float):
    xb = x_ref[...].astype(jnp.float32)  # [BB, H, W, C]
    bb, h, w, c = xb.shape
    cg = c // num_groups
    flat = xb.reshape(bb, h * w, c)  # leading-dim reshapes only — layout-legal
    gmat = gmat_ref[...]  # [C, G] one-hot group membership

    sum_c = jnp.sum(flat, axis=1)  # [BB, C]
    sumsq_c = jnp.sum(flat * flat, axis=1)
    denom = float(h * w * cg)
    mean_g = jnp.dot(sum_c, gmat, preferred_element_type=jnp.float32) / denom  # [BB, G]
    meansq_g = jnp.dot(sumsq_c, gmat, preferred_element_type=jnp.float32) / denom
    var_g = jnp.maximum(meansq_g - mean_g * mean_g, 0.0)
    # broadcast group stats back to channels via the transposed one-hot
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)  # [BB, C]
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), gmat.T, preferred_element_type=jnp.float32)

    y = (flat - mean_c[:, None, :]) * rstd_c[:, None, :] * scale_ref[...] + bias_ref[...]
    y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.reshape(bb, h, w, c).astype(out_ref.dtype)


def _pick_block_batch(b: int, row_bytes: int, budget: int = 1024 * 1024) -> int:
    bb = max(1, min(b, budget // max(row_bytes, 1)))
    while b % bb:
        bb -= 1
    return bb


def _forward_pallas(x, scale, bias, num_groups: int, eps: float):
    b, h, w, c = x.shape
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, 1, c)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, 1, c)
    cg = c // num_groups
    gmat_np = np.zeros((c, num_groups), np.float32)
    gmat_np[np.arange(c), np.arange(c) // cg] = 1.0
    gmat = jnp.asarray(gmat_np)
    bb = _pick_block_batch(b, h * w * c * x.dtype.itemsize)
    return pl.pallas_call(
        partial(_kernel, num_groups=num_groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )(x, scale2, bias2, gmat)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5):
    return _forward_pallas(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    return _forward_pallas(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda a, s, b: groupnorm_silu_reference(a, s, b, num_groups, eps), x, scale, bias)
    return vjp(g)


fused_groupnorm_silu.defvjp(_fwd, _bwd)


def groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """Dispatching entry point: Pallas where it wins, XLA reference elsewhere.

    Measured on v5e (batch-blocked kernel): ~2× at 16²×256, parity at 32²×128,
    slower below 8² spatial (matmul aggregation overhead dominates), and
    VMEM-infeasible above ~1MB per batch row (needs spatial tiling — the
    statistics are full-row). Only used on the TPU backend.
    """
    b, h, w, c = x.shape
    row_bytes = h * w * c * x.dtype.itemsize
    use_pallas = (
        jax.default_backend() == "tpu"
        and h * w >= 256
        and row_bytes <= 1024 * 1024
        and c % num_groups == 0
    )
    if use_pallas:
        return fused_groupnorm_silu(x, scale, bias, num_groups, eps)
    return groupnorm_silu_reference(x, scale, bias, num_groups, eps)
