"""Timestep embeddings.

Behavioral contract: reference `models/embeddings.py:22-63` (sinusoidal
`get_timestep_embedding`), `:155-230` (`TimestepEmbedding` MLP + `Timesteps`),
`:232-260` (`GaussianFourierProjection`). The sin/cos half-ordering and the
`flip_sin_to_cos` / `downscale_freq_shift` knobs decide bit-compatibility with
`google/ddpm-*` checkpoints (which use flip_sin_to_cos=False, freq_shift=1).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal embeddings, computed in f32 (timesteps carry no weights)."""
    assert timesteps.ndim == 1, "timesteps should be a 1-D array of shape [batch]"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(nn.Module):
    """Parameter-free sinusoidal projection (reference embeddings.py:215-230)."""

    num_channels: int
    flip_sin_to_cos: bool = False
    downscale_freq_shift: float = 1.0

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        return get_timestep_embedding(
            timesteps,
            self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )


class TimestepEmbedding(nn.Module):
    """linear_1 → SiLU → linear_2 MLP (reference embeddings.py:155-213)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        out_dim = self.out_dim or self.time_embed_dim
        sample = nn.Dense(out_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class GaussianFourierProjection(nn.Module):
    """Random-feature time embedding used by `time_embedding_type='fourier'`
    (NCSN++ family; reference embeddings.py:232-260). The projection weight is
    a fixed (non-trained) gaussian draw."""

    embedding_size: int = 256
    scale: float = 1.0
    log: bool = True
    flip_sin_to_cos: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param(
            "weight",
            lambda key, shape: self.scale * jax.random.normal(key, shape, dtype=jnp.float32),
            (self.embedding_size,),
        )
        weight = jax.lax.stop_gradient(weight)
        if self.log:
            x = jnp.log(x)
        x_proj = x.astype(jnp.float32)[:, None] * weight[None, :] * 2 * jnp.pi
        if self.flip_sin_to_cos:
            return jnp.concatenate([jnp.cos(x_proj), jnp.sin(x_proj)], axis=-1)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)
