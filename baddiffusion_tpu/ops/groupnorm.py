"""Pallas TPU kernels: fused GroupNorm + SiLU, forward AND backward.

The UNet spends ~45 GroupNorm→SiLU pairs per step on [B,H,W,C] activations;
each is HBM-bandwidth-bound. The forward kernel performs statistics,
normalization, affine and SiLU in one VMEM pass per batch block (one HBM read
+ one write). The backward kernel is hand-written (not a VJP recompute): it
reads x and the output cotangent once, reconstructs x̂ from saved per-group
(mean, rstd) residuals — two [B, G] vectors, negligible HBM — and emits dx,
dγ, dβ in a single pass. dγ/dβ accumulate across the sequential TPU grid into
a (1, 1, C) output block.

Mosaic-friendly layout choices: channels stay on the lane axis end-to-end —
group statistics are computed as per-channel reductions aggregated through a
one-hot [C, G] matmul (lane-splitting reshapes like [H,W,C]→[HW,G,C/G] are
not supported by the TPU vector layout pass), and broadcast back through its
transpose.

Backward math (per batch row, group g; ĉ = channels of g):
  y = x̂·γ + β,  out = y·σ(y)
  dy = ḡ·σ(y)·(1 + y·(1−σ(y)))
  dβ_c = Σ_{b,hw} dy,   dγ_c = Σ_{b,hw} dy·x̂
  dx = rstd·(dx̂ − mean_g(dx̂) − x̂·mean_g(dx̂·x̂)),  dx̂ = dy·γ
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


def _group_onehot(c: int, num_groups: int) -> np.ndarray:
    gmat = np.zeros((c, num_groups), np.float32)
    gmat[np.arange(c), np.arange(c) // (c // num_groups)] = 1.0
    return gmat


def _fwd_kernel(x_ref, scale_ref, bias_ref, gmat_ref, out_ref, mean_ref, rstd_ref,
                *, num_groups: int, eps: float, save_stats: bool):
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
    rstd_g = jax.lax.rsqrt(var_g + eps)
    if save_stats:
        mean_ref[...] = mean_g
        rstd_ref[...] = rstd_g
    # broadcast group stats back to channels via the transposed one-hot
    mean_c = jnp.dot(mean_g, gmat.T, preferred_element_type=jnp.float32)  # [BB, C]
    rstd_c = jnp.dot(rstd_g, gmat.T, preferred_element_type=jnp.float32)

    y = (flat - mean_c[:, None, :]) * rstd_c[:, None, :] * scale_ref[...] + bias_ref[...]
    y = y * jax.nn.sigmoid(y)
    out_ref[...] = y.reshape(bb, h, w, c).astype(out_ref.dtype)


def _bwd_kernel(x_ref, scale_ref, bias_ref, gmat_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref, *, num_groups: int, eps: float):
    xb = x_ref[...].astype(jnp.float32)
    bb, h, w, c = xb.shape
    cg = c // num_groups
    flat = xb.reshape(bb, h * w, c)
    gbar = g_ref[...].astype(jnp.float32).reshape(bb, h * w, c)
    gmat = gmat_ref[...]
    gamma = scale_ref[...]  # [1, 1, C]

    mean_c = jnp.dot(mean_ref[...], gmat.T, preferred_element_type=jnp.float32)  # [BB, C]
    rstd_c = jnp.dot(rstd_ref[...], gmat.T, preferred_element_type=jnp.float32)
    xhat = (flat - mean_c[:, None, :]) * rstd_c[:, None, :]

    y = xhat * gamma + bias_ref[...]
    s = jax.nn.sigmoid(y)
    dy = gbar * (s * (1.0 + y * (1.0 - s)))  # SiLU'

    dbias_part = jnp.sum(dy, axis=(0, 1))  # [C]
    dscale_part = jnp.sum(dy * xhat, axis=(0, 1))

    dxhat = dy * gamma
    denom = float(h * w * cg)
    sum1_c = jnp.sum(dxhat, axis=1)  # [BB, C]
    sum2_c = jnp.sum(dxhat * xhat, axis=1)
    m1_c = jnp.dot(jnp.dot(sum1_c, gmat, preferred_element_type=jnp.float32) / denom,
                   gmat.T, preferred_element_type=jnp.float32)
    m2_c = jnp.dot(jnp.dot(sum2_c, gmat, preferred_element_type=jnp.float32) / denom,
                   gmat.T, preferred_element_type=jnp.float32)
    dx = rstd_c[:, None, :] * (dxhat - m1_c[:, None, :] - xhat * m2_c[:, None, :])
    dx_ref[...] = dx.reshape(bb, h, w, c).astype(dx_ref.dtype)

    # dγ/dβ accumulate across the (sequential) batch-block grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dscale_ref[...] += dscale_part.reshape(1, 1, c)
    dbias_ref[...] += dbias_part.reshape(1, 1, c)


def _pick_block_batch(b: int, row_f32_bytes: int, budget: int) -> int:
    """Largest batch block that (a) divides b, (b) is sublane-legal for the
    tiled [bb, G] stat blocks — a multiple of 8, or the whole batch (full-dim
    blocks are exempt from tiling alignment) — and (c) fits the VMEM budget.
    Falls back to the smallest legal block if none fits."""
    cands = [d for d in range(1, b + 1) if b % d == 0 and (d % 8 == 0 or d == b)]
    fits = [d for d in cands if d * row_f32_bytes <= budget]
    return max(fits) if fits else min(cands)


def _forward_pallas(x, scale, bias, num_groups: int, eps: float, save_stats: bool):
    b, h, w, c = x.shape
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, 1, c)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, 1, c)
    gmat = jnp.asarray(_group_onehot(c, num_groups))
    bb = _pick_block_batch(b, h * w * c * 4, budget=4 * 1024 * 1024)
    out, mean_g, rstd_g = pl.pallas_call(
        partial(_fwd_kernel, num_groups=num_groups, eps=eps, save_stats=save_stats),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, num_groups), jnp.float32),
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, num_groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, num_groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(x, scale2, bias2, gmat)
    return out, mean_g, rstd_g


def _backward_pallas(x, scale, bias, mean_g, rstd_g, g, num_groups: int, eps: float):
    b, h, w, c = x.shape
    scale2 = jnp.asarray(scale, jnp.float32).reshape(1, 1, c)
    bias2 = jnp.asarray(bias, jnp.float32).reshape(1, 1, c)
    gmat = jnp.asarray(_group_onehot(c, num_groups))
    # three [bb,h,w,c] io buffers + f32 temps: tighter block budget
    bb = _pick_block_batch(b, h * w * c * 4, budget=2 * 1024 * 1024)
    dx, dscale, dbias = pl.pallas_call(
        partial(_bwd_kernel, num_groups=num_groups, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c), jnp.float32),
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, num_groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, num_groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )(x, scale2, bias2, gmat, mean_g, rstd_g, g)
    return dx, dscale.reshape(c), dbias.reshape(c)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5):
    out, _, _ = _forward_pallas(x, scale, bias, num_groups, eps, save_stats=False)
    return out


def _fwd(x, scale, bias, num_groups, eps):
    out, mean_g, rstd_g = _forward_pallas(x, scale, bias, num_groups, eps, save_stats=True)
    return out, (x, scale, bias, mean_g, rstd_g)


def _bwd(num_groups, eps, residuals, g):
    x, scale, bias, mean_g, rstd_g = residuals
    dx, dscale, dbias = _backward_pallas(x, scale, bias, mean_g, rstd_g, g, num_groups, eps)
    return dx, dscale.astype(jnp.result_type(scale)), dbias.astype(jnp.result_type(bias))


fused_groupnorm_silu.defvjp(_fwd, _bwd)


def groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """Dispatching entry point for the fused kernel (TPU backend only).

    RETIRED FROM THE DEFAULT PATH, with data. Measured on v5e (bf16, batch
    128): isolated fwd+bwd is at best parity with XLA (0.9-1.1×; these ops are
    launch-overhead-bound at ~20µs), and END-TO-END the kernel REGRESSES the
    training step — 3751 → 3348 samples/sec (-11%) and 1000-step sampling
    11.4 → 8.95 imgs/sec — because XLA fuses GroupNorm+SiLU into the
    surrounding convolutions inside the full graph, and a custom call is a
    fusion barrier ~45 times per step. The hand-written backward (single-pass
    dx/dγ/dβ) is correct and tested (tests/test_ops.py) but cannot beat an
    already-fused producer. The same holds at 256px shapes where GN traffic is
    largest: 256px micro-batch-4 train step 182.7 → 194.4 ms/step (-6%) with
    the kernel on. Models call this only under BADDIFFUSION_FUSE_GN=1
    (models/resnet.py:gn_silu); default training/inference uses the XLA form.
    """
    b, h, w, c = x.shape
    row_f32 = h * w * c * 4
    use_pallas = (
        jax.default_backend() == "tpu"
        and h * w >= 64
        and c % num_groups == 0
        and c % 128 == 0  # keep channels lane-aligned
        and w % 8 == 0
        # the chosen block (incl. the smallest legal one) must stay VMEM-safe:
        # the backward kernel's scoped VMEM is ~5.5x the f32 block bytes
        and _pick_block_batch(b, row_f32, budget=2 * 1024 * 1024) * row_f32 <= 2 * 1024 * 1024
    )
    if use_pallas:
        return fused_groupnorm_silu(x, scale, bias, num_groups, eps)
    return groupnorm_silu_reference(x, scale, bias, num_groups, eps)
