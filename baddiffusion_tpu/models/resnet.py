"""ResNet block + resampling layers (NHWC, bf16-compute / f32-param).

Behavioral contract: reference `models/resnet.py:95-209` (`Upsample2D` /
`Downsample2D`), `:418-601` (`ResnetBlock2D`: GN→SiLU→conv→+temb→GN→SiLU→
dropout→conv→shortcut, with `time_embedding_norm` in {default, scale_shift}),
and `:211-384,744-786` (FIR up/downfirdn used by NCSN++ skip blocks).

TPU-first choices: channel-last layout so convs lower directly onto the MXU,
GroupNorm statistics always in f32, and parameter names mirroring the HF state
dict so torch checkpoints map 1:1 (see io/hf.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis with f32 statistics.

    Matches torch.nn.GroupNorm semantics (reference resnet.py:491,510): groups
    partition channels contiguously; eps inside the sqrt; affine scale/bias.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        assert channels % self.num_groups == 0, (channels, self.num_groups)
        scale = self.param("scale", nn.initializers.ones, (channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (channels,), jnp.float32)

        orig_dtype = x.dtype
        import os

        if os.environ.get("BADDIFFUSION_GN_BARRIER") == "1":
            # experiment gate: materialize the GN input so the stats
            # reductions can NOT fuse into the producing conv as a
            # multi-output epilogue (which constrains the conv's tiling);
            # costs one extra HBM round-trip of the activation per GN
            x = jax.lax.optimization_barrier(x)
        x32 = x.astype(jnp.float32)
        shape = x.shape[:-1] + (self.num_groups, channels // self.num_groups)
        grouped = x32.reshape(shape)
        # reduce over all spatial dims + the within-group channel dim;
        # single-pass E[x²]−E[x]² so XLA reads the activation once (the
        # two-pass form costs an extra HBM sweep per GN — ~13% of step time)
        red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(grouped, axis=red_axes, keepdims=True)
        mean_sq = jnp.mean(jnp.square(grouped), axis=red_axes, keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        normed = (grouped - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = normed.reshape(x.shape)
        return (normed * scale + bias).astype(orig_dtype)


def gn_silu(x, groups: int, eps: float, dtype, name: str):
    """GroupNorm immediately followed by SiLU. Routed through the fused
    Pallas kernel (ops/groupnorm.py) when BADDIFFUSION_FUSE_GN=1 — measured
    end-to-end before enabling; see the kernel module docstring for numbers.
    Parameter layout is identical either way (checkpoint-compatible)."""
    import os

    if os.environ.get("BADDIFFUSION_FUSE_GN") == "1":
        return GroupNormSiLU(groups, eps, dtype=dtype, name=name)(x)
    return nn.silu(GroupNorm(groups, eps, dtype=dtype, name=name)(x))


class GroupNormSiLU(nn.Module):
    """GroupNorm immediately followed by SiLU — same param layout as GroupNorm
    (so checkpoints are interchangeable) but routed through the fused Pallas
    kernel on TPU where profitable (ops/groupnorm.py)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from baddiffusion_tpu.ops.groupnorm import groupnorm_silu

        channels = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (channels,), jnp.float32)
        return groupnorm_silu(x, scale, bias, self.num_groups, self.epsilon)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference resnet.py:95-162)."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.use_conv:
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
            )(x)
        return x


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsample (reference resnet.py:164-209).

    ``padding=0`` reproduces the google/ddpm checkpoints' asymmetric manual pad
    (0,1,0,1) before an unpadded conv (reference resnet.py:199-202).
    """

    out_channels: int
    use_conv: bool = True
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            if self.padding == 0:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                pad = ((0, 0), (0, 0))
            else:
                pad = ((self.padding, self.padding), (self.padding, self.padding))
            return nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


# --------------------------------------------------------------------------
# FIR filtering (NCSN++ / skip-block family; reference resnet.py:211-384)
# --------------------------------------------------------------------------


def _fir_kernel_2d(kernel=(1, 3, 3, 1), gain: float = 1.0) -> np.ndarray:
    k = np.asarray(kernel, dtype=np.float32)
    k = np.outer(k, k)
    k = k / k.sum() * gain
    return k


def upfirdn2d(x: jnp.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1, pad=(0, 0)) -> jnp.ndarray:
    """NHWC upfirdn (reference resnet.py:744-786 upfirdn2d_native, re-derived
    as dilated depthwise conv so XLA lowers it onto the MXU)."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # upsample by zero-insertion
    if up > 1:
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)))
        x = x.reshape(b, h * up, w * up, c)
    x = jnp.pad(
        x,
        (
            (0, 0),
            (max(pad[0], 0), max(pad[1], 0)),
            (max(pad[0], 0), max(pad[1], 0)),
            (0, 0),
        ),
    )
    if pad[0] < 0 or pad[1] < 0:
        x = x[:, max(-pad[0], 0) : x.shape[1] - max(-pad[1], 0), max(-pad[0], 0) : x.shape[2] - max(-pad[1], 0), :]
    # depthwise conv with the (flipped) FIR filter
    k = jnp.asarray(kernel[::-1, ::-1], dtype=x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with feature_group_count=c
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down, down),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return y


def upsample_2d_fir(x: jnp.ndarray, kernel=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    k = _fir_kernel_2d(kernel, gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d_fir(x: jnp.ndarray, kernel=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    k = _fir_kernel_2d(kernel, gain)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


class FirUpsample2D(nn.Module):
    """FIR upsample with optional fused conv (reference resnet.py:211-303)."""

    out_channels: int
    use_conv: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_2d_fir(x, self.fir_kernel)
        if self.use_conv:
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="Conv2d_0"
            )(x)
        return x


class FirDownsample2D(nn.Module):
    """FIR downsample with optional conv (reference resnet.py:305-384)."""

    out_channels: int
    use_conv: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = downsample_2d_fir(x, self.fir_kernel)
        if self.use_conv:
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="Conv2d_0"
            )(x)
        return x


class ResnetBlock2D(nn.Module):
    """The UNet residual block (reference resnet.py:418-601).

    norm1 → SiLU → [resample] → conv1 → (+ time proj) → norm2 →
    [scale_shift] → SiLU → dropout → conv2 → (+ shortcut) / output_scale.
    """

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    time_embedding_norm: str = "default"  # default | scale_shift
    kernel: Optional[str] = None  # None | "fir" | "sde_vp"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    up: bool = False
    down: bool = False
    conv_shortcut_bias: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        out_channels = self.out_channels or self.in_channels
        groups_out = self.groups_out or self.groups

        hidden = gn_silu(x, self.groups, self.eps, self.dtype, name="norm1")

        if self.up:
            if self.kernel == "fir":
                resample = partial(upsample_2d_fir, kernel=(1, 3, 3, 1))
            elif self.kernel == "sde_vp":
                resample = lambda v: jax.image.resize(
                    v, (v.shape[0], v.shape[1] * 2, v.shape[2] * 2, v.shape[3]), "nearest"
                )
            else:
                resample = Upsample2D(self.in_channels, use_conv=False, dtype=self.dtype, name="upsample")
            x = resample(x)
            hidden = resample(hidden)
        elif self.down:
            if self.kernel == "fir":
                resample = partial(downsample_2d_fir, kernel=(1, 3, 3, 1))
            elif self.kernel == "sde_vp":
                resample = lambda v: nn.avg_pool(v, (2, 2), strides=(2, 2))
            else:
                resample = Downsample2D(self.in_channels, use_conv=False, padding=1, dtype=self.dtype, name="downsample")
            x = resample(x)
            hidden = resample(hidden)

        hidden = nn.Conv(out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(hidden)

        temb_out = None
        if temb is not None and self.temb_channels is not None:
            proj_dim = 2 * out_channels if self.time_embedding_norm == "scale_shift" else out_channels
            temb_out = nn.Dense(proj_dim, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            temb_out = temb_out[:, None, None, :]

        if temb_out is not None and self.time_embedding_norm == "default":
            hidden = hidden + temb_out

        if temb_out is not None and self.time_embedding_norm == "scale_shift":
            hidden = GroupNorm(groups_out, self.eps, dtype=self.dtype, name="norm2")(hidden)
            scale, shift = jnp.split(temb_out, 2, axis=-1)
            hidden = hidden * (1 + scale) + shift
            hidden = nn.silu(hidden)
        else:
            hidden = gn_silu(hidden, groups_out, self.eps, self.dtype, name="norm2")
        if self.dropout > 0.0:
            hidden = nn.Dropout(self.dropout, deterministic=deterministic)(hidden)
        hidden = nn.Conv(out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(hidden)

        use_in_shortcut = (
            self.in_channels != out_channels if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_in_shortcut:
            x = nn.Conv(
                out_channels,
                (1, 1),
                use_bias=self.conv_shortcut_bias,
                dtype=self.dtype,
                name="conv_shortcut",
            )(x)

        return (x + hidden) / self.output_scale_factor
