"""VQ-VAE / KL-VAE for the latent-diffusion path (NHWC).

Behavioral contract: reference `models/vq_model.py:69-156` (VQModel: encoder →
quant_conv → VectorQuantizer → post_quant_conv → decoder),
`models/vae.py:38-230` (Encoder/Decoder with temb-free blocks, GroupNorm eps
1e-6, downsample_padding=0), `models/vae.py:245-370` (VectorQuantizer nearest-
codebook lookup) and `models/autoencoder_kl.py` (AutoencoderKL with
DiagonalGaussian posterior). Used by the LDM-CELEBA-HQ-256 alias
(reference model.py:710-711) through the modified LDMPipeline
(pipeline_latent_diffusion_uncond.py:39-137).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from baddiffusion_tpu.models.blocks import DownEncoderBlock2D, UNetMidBlock2D, UpDecoderBlock2D
from baddiffusion_tpu.models.resnet import GroupNorm


class Encoder(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",)
    block_out_channels: Tuple[int, ...] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(x)
        output_channel = self.block_out_channels[0]
        for i, block_type in enumerate(self.down_block_types):
            input_channel = output_channel
            output_channel = self.block_out_channels[i]
            is_final = i == len(self.block_out_channels) - 1
            x = DownEncoderBlock2D(
                in_channels=input_channel,
                out_channels=output_channel,
                num_layers=self.layers_per_block,
                resnet_eps=1e-6,
                resnet_groups=self.norm_num_groups,
                add_downsample=not is_final,
                downsample_padding=0,
                add_attention=block_type.startswith("Attn"),
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x, deterministic)
        x = UNetMidBlock2D(
            in_channels=self.block_out_channels[-1],
            temb_channels=None,
            resnet_eps=1e-6,
            resnet_groups=self.norm_num_groups,
            attn_num_head_channels=None,
            dtype=self.dtype,
            name="mid_block",
        )(x, None, deterministic)
        x = GroupNorm(self.norm_num_groups, 1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        out_ch = 2 * self.out_channels if self.double_z else self.out_channels
        return nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",)
    block_out_channels: Tuple[int, ...] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        x = UNetMidBlock2D(
            in_channels=self.block_out_channels[-1],
            temb_channels=None,
            resnet_eps=1e-6,
            resnet_groups=self.norm_num_groups,
            attn_num_head_channels=None,
            dtype=self.dtype,
            name="mid_block",
        )(x, None, deterministic)
        reversed_channels = list(reversed(self.block_out_channels))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(self.up_block_types):
            output_channel = reversed_channels[i]
            is_final = i == len(self.block_out_channels) - 1
            x = UpDecoderBlock2D(
                in_channels=x.shape[-1],
                out_channels=output_channel,
                num_layers=self.layers_per_block + 1,
                resnet_eps=1e-6,
                resnet_groups=self.norm_num_groups,
                add_upsample=not is_final,
                add_attention=block_type.startswith("Attn"),
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(x, deterministic)
        x = GroupNorm(self.norm_num_groups, 1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(x)


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantization (reference vae.py:245-370, inference path:
    argmin L2 → embed lookup; straight-through gradient)."""

    n_e: int
    vq_embed_dim: int

    @nn.compact
    def __call__(self, z):
        emb = nn.Embed(self.n_e, self.vq_embed_dim, name="embedding")
        codebook = emb.embedding  # [n_e, d]
        flat = z.reshape(-1, self.vq_embed_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * flat @ codebook.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, idx.reshape(z.shape[:-1])


@dataclasses.dataclass(frozen=True)
class VQModelConfig:
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",)
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",)
    block_out_channels: Tuple[int, ...] = (64,)
    layers_per_block: int = 1
    latent_channels: int = 3
    sample_size: int = 32
    num_vq_embeddings: int = 256
    norm_num_groups: int = 32
    vq_embed_dim: Optional[int] = None
    scaling_factor: float = 0.18215

    def __post_init__(self):
        for f in ("down_block_types", "up_block_types", "block_out_channels"):
            object.__setattr__(self, f, tuple(getattr(self, f)))

    @classmethod
    def load(cls, path: str, subfolder: Optional[str] = None) -> "VQModelConfig":
        if subfolder:
            path = os.path.join(path, subfolder)
        with open(os.path.join(path, "config.json")) as f:
            payload = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in payload.items() if k in fields})


class VQModel(nn.Module):
    """reference models/vq_model.py:69-156."""

    config: VQModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            in_channels=cfg.in_channels,
            out_channels=cfg.latent_channels,
            down_block_types=cfg.down_block_types,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            double_z=False,
            dtype=self.dtype,
        )
        vq_dim = cfg.vq_embed_dim or cfg.latent_channels
        self.quant_conv = nn.Conv(vq_dim, (1, 1), dtype=self.dtype)
        self.quantize = VectorQuantizer(cfg.num_vq_embeddings, vq_dim)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.decoder = Decoder(
            in_channels=cfg.latent_channels,
            out_channels=cfg.out_channels,
            up_block_types=cfg.up_block_types,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
        )

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(h))

    def __call__(self, x):
        return self.decode(self.encode(x))


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",)
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",)
    block_out_channels: Tuple[int, ...] = (64,)
    layers_per_block: int = 1
    latent_channels: int = 4
    sample_size: int = 32
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    def __post_init__(self):
        for f in ("down_block_types", "up_block_types", "block_out_channels"):
            object.__setattr__(self, f, tuple(getattr(self, f)))


class AutoencoderKL(nn.Module):
    """reference models/autoencoder_kl.py (KL posterior VAE)."""

    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            in_channels=cfg.in_channels,
            out_channels=cfg.latent_channels,
            down_block_types=cfg.down_block_types,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            double_z=True,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.decoder = Decoder(
            in_channels=cfg.latent_channels,
            out_channels=cfg.out_channels,
            up_block_types=cfg.up_block_types,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
        )

    def encode(self, x):
        """Returns (mean, logvar) of the diagonal gaussian posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = mean if key is None else mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return self.decode(z)
