"""FID InceptionV3 (the 2015 TF-ported network) in flax — pool3 features.

Behavioral contract: the reference's FID uses `pytorch_fid.inception.InceptionV3`
pool3 activations (fid_score.py:53,91-147). This is that architecture:
torchvision inception_v3 with the FID modifications (FIDInceptionA/C/E —
avg-pools with count_include_pad=False, and Mixed_7c using max-pool in its
pool branch), BasicConv2d = conv(no bias) + BN(eps=1e-3, frozen stats) + relu,
input resized to 299² and mapped [0,1]→[-1,1].

Weights load from pytorch_fid's ``pt_inception-2015-12-05-6726825d.pth`` via
`load_fid_inception` (offline: stage the file and set $BADDIFFUSION_FID_WEIGHTS).
NHWC throughout; the torch-key mapping reuses io/hf.py conversion rules.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Inference-mode BN: (x−μ)/√(σ²+eps)·γ+β with stored running stats."""

    features: int
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (self.features,), jnp.float32)
        x32 = x.astype(jnp.float32)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # exact f32 convs: FID activations must match pytorch-fid numerics
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
            precision=jax.lax.Precision.HIGHEST,
        )(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x)


def _avg_pool_no_pad_count(x, window=3):
    """3x3 stride-1 avg pool with count_include_pad=False (FID blocks)."""
    pad = window // 2
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3", dtype=self.dtype)(b3)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3", dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3", dtype=self.dtype)(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5", dtype=self.dtype)(bd)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2", dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4", dtype=self.dtype)(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # Mixed_7c (FIDInceptionE_2) uses max pool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a", dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b", dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Input: NHWC in [0,1] (any spatial size; resized to 299²).
    Output: [B, 2048] pool3 activations."""

    resize_input: bool = True
    normalize_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            # antialias=False matches pytorch-fid's F.interpolate(bilinear,
            # align_corners=False) when DOWNSAMPLING >299px inputs (jax's
            # default antialiased triangle kernel would diverge from it);
            # for upsampling (32/256px datasets) the flag is a no-op
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear", antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(self.dtype)

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3", dtype=self.dtype)(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=self.dtype)(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c", dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        return x.astype(jnp.float32)


def load_fid_inception(weights_path: str):
    """(model, params) from pytorch_fid's .pth (torch state dict)."""
    from baddiffusion_tpu.io.hf import torch_to_flax_params

    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if not k.startswith(("fc.", "AuxLogits."))}
    sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}
    params = torch_to_flax_params(sd)
    model = FIDInceptionV3()
    return model, params
