"""UNet2DModel — the ε-predictor — in flax.linen (NHWC, bf16-ready).

Behavioral contract: reference `models/unet_2d.py:38-326` (config surface,
block wiring, skip-sample plumbing, fourier-time division) and the block
factories `models/unet_2d_blocks.py:28-388`. Parameter names mirror the HF
state dict (``down_blocks_0/resnets_0/conv1`` ↔ ``down_blocks.0.resnets.0.conv1``)
so `google/ddpm-*` torch checkpoints convert mechanically (io/hf.py).

TPU-first: activations NHWC, conv kernels HWIO, attention einsum with f32
softmax accumulation, GroupNorm stats in f32 — all shapes static so the whole
forward jits into one XLA program.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from baddiffusion_tpu.models.blocks import (
    AttnDownBlock2D,
    AttnUpBlock2D,
    DownBlock2D,
    SkipDownBlock2D,
    SkipUpBlock2D,
    UNetMidBlock2D,
    UpBlock2D,
)
from baddiffusion_tpu.models.embeddings import GaussianFourierProjection, TimestepEmbedding, Timesteps
from baddiffusion_tpu.models.resnet import GroupNorm, gn_silu

MODEL_CONFIG_NAME = "config.json"


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    """Mirrors the reference UNet2DModel @register_to_config signature
    (models/unet_2d.py:82-106) so HF ``config.json`` files load directly."""

    sample_size: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3
    center_input_sample: bool = False
    time_embedding_type: str = "positional"
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (224, 448, 672, 896)
    layers_per_block: int = 2
    mid_block_scale_factor: float = 1.0
    downsample_padding: int = 1
    act_fn: str = "silu"
    attention_head_dim: Optional[int] = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    resnet_time_scale_shift: str = "default"
    add_attention: bool = True
    class_embed_type: Optional[str] = None
    num_class_embeds: Optional[int] = None
    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "down_block_types", tuple(self.down_block_types))
        object.__setattr__(self, "up_block_types", tuple(self.up_block_types))
        object.__setattr__(self, "block_out_channels", tuple(self.block_out_channels))

    # -- json round trip (HF config.json contract) ---------------------------
    def save(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        payload = {"_class_name": "UNet2DModel", "_diffusers_version": "0.16.0.dev0"}
        d = dataclasses.asdict(self)
        d.pop("dropout", None)  # not part of the HF config surface
        payload.update({k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()})
        with open(os.path.join(save_directory, MODEL_CONFIG_NAME), "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str, subfolder: Optional[str] = None) -> "UNet2DConfig":
        if subfolder:
            path = os.path.join(path, subfolder)
        if os.path.isdir(path):
            path = os.path.join(path, MODEL_CONFIG_NAME)
        with open(path) as f:
            payload = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in payload.items() if k in fields})


# scratch-model architecture used when no checkpoint is given
# (reference model.py:657-679: 128,128,256,256,512,512 with one AttnDown)
DEFAULT_SCRATCH_CONFIG = UNet2DConfig(
    block_out_channels=(128, 128, 256, 256, 512, 512),
    down_block_types=(
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "AttnDownBlock2D",
        "DownBlock2D",
    ),
    up_block_types=(
        "UpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
    ),
)


class UNet2DModel(nn.Module):
    config: UNet2DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """sample: [B, H, W, C] noisy input; timesteps: scalar or [B]."""
        cfg = self.config
        if cfg.center_input_sample:
            sample = 2.0 * sample - 1.0

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # 1. time embedding
        time_embed_dim = cfg.block_out_channels[0] * 4
        if cfg.time_embedding_type == "fourier":
            t_emb = GaussianFourierProjection(
                embedding_size=cfg.block_out_channels[0], scale=16.0, name="time_proj"
            )(timesteps)
        else:
            t_emb = Timesteps(
                cfg.block_out_channels[0],
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift,
                name="time_proj",
            )(timesteps)
        t_emb = t_emb.astype(self.dtype)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        if cfg.class_embed_type is None and cfg.num_class_embeds is not None:
            class_emb = nn.Embed(cfg.num_class_embeds, time_embed_dim, dtype=self.dtype, name="class_embedding")(
                class_labels.astype(jnp.int32)
            )
            emb = emb + class_emb
        elif cfg.class_embed_type == "timestep":
            class_emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="class_embedding")(
                Timesteps(cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)(class_labels)
            )
            emb = emb + class_emb
        elif cfg.class_embed_type == "identity":
            emb = emb + class_labels.astype(self.dtype)

        # 2. pre-process
        skip_sample = sample
        sample = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in"
        )(sample.astype(self.dtype))

        # 3. down path
        down_block_res_samples = (sample,)
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            common = dict(
                in_channels=input_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                num_layers=cfg.layers_per_block,
                resnet_eps=cfg.norm_eps,
                resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                add_downsample=not is_final,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )
            if block_type == "DownBlock2D":
                sample, res_samples = DownBlock2D(
                    resnet_groups=cfg.norm_num_groups,
                    downsample_padding=cfg.downsample_padding,
                    **common,
                )(sample, emb, deterministic)
            elif block_type == "AttnDownBlock2D":
                sample, res_samples = AttnDownBlock2D(
                    resnet_groups=cfg.norm_num_groups,
                    downsample_padding=cfg.downsample_padding,
                    attn_num_head_channels=cfg.attention_head_dim,
                    **common,
                )(sample, emb, deterministic)
            elif block_type in ("SkipDownBlock2D", "AttnSkipDownBlock2D"):
                sample, res_samples, skip_sample = SkipDownBlock2D(
                    downsample_padding=cfg.downsample_padding,
                    add_attention=block_type.startswith("Attn"),
                    attn_num_head_channels=cfg.attention_head_dim,
                    **common,
                )(sample, emb, skip_sample, deterministic)
            else:
                raise NotImplementedError(f"down block {block_type!r}")
            down_block_res_samples += res_samples

        # 4. mid
        sample = UNetMidBlock2D(
            in_channels=cfg.block_out_channels[-1],
            temb_channels=time_embed_dim,
            resnet_eps=cfg.norm_eps,
            output_scale_factor=cfg.mid_block_scale_factor,
            resnet_time_scale_shift=cfg.resnet_time_scale_shift,
            attn_num_head_channels=cfg.attention_head_dim,
            resnet_groups=cfg.norm_num_groups,
            add_attention=cfg.add_attention,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="mid_block",
        )(sample, emb, deterministic)

        # 5. up path — the skip chain restarts at None and accumulates upward
        # (reference unet_2d.py:301; the down-path skip ends at the last
        # SkipDown block's fusion)
        skip_sample = None
        reversed_channels = list(reversed(cfg.block_out_channels))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(cfg.block_out_channels) - 1)]
            is_final = i == len(cfg.block_out_channels) - 1
            n_res = cfg.layers_per_block + 1
            res_samples = down_block_res_samples[-n_res:]
            down_block_res_samples = down_block_res_samples[:-n_res]
            common = dict(
                in_channels=input_channel,
                prev_output_channel=prev_output_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                num_layers=n_res,
                resnet_eps=cfg.norm_eps,
                resnet_time_scale_shift=cfg.resnet_time_scale_shift,
                add_upsample=not is_final,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )
            if block_type == "UpBlock2D":
                sample = UpBlock2D(resnet_groups=cfg.norm_num_groups, **common)(
                    sample, res_samples, emb, deterministic
                )
            elif block_type == "AttnUpBlock2D":
                sample = AttnUpBlock2D(
                    resnet_groups=cfg.norm_num_groups,
                    attn_num_head_channels=cfg.attention_head_dim,
                    **common,
                )(sample, res_samples, emb, deterministic)
            elif block_type in ("SkipUpBlock2D", "AttnSkipUpBlock2D"):
                sample, skip_sample = SkipUpBlock2D(
                    add_attention=block_type.startswith("Attn"),
                    attn_num_head_channels=cfg.attention_head_dim,
                    **common,
                )(sample, res_samples, emb, skip_sample, deterministic)
            else:
                raise NotImplementedError(f"up block {block_type!r}")

        # 6. post-process
        num_groups_out = cfg.norm_num_groups if cfg.norm_num_groups is not None else min(
            cfg.block_out_channels[0] // 4, 32
        )
        sample = gn_silu(sample, num_groups_out, cfg.norm_eps, self.dtype, name="conv_norm_out")
        sample = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out"
        )(sample)

        if skip_sample is not None:
            sample = sample + skip_sample

        if cfg.time_embedding_type == "fourier":
            t = timesteps.reshape((sample.shape[0],) + (1,) * (sample.ndim - 1))
            sample = sample / t.astype(sample.dtype)

        return sample.astype(jnp.float32)

    # -- convenience -----------------------------------------------------------
    def init_params(self, key: jax.Array, sample_size: Optional[int] = None):
        cfg = self.config
        size = sample_size or cfg.sample_size or 32
        dummy = jnp.zeros((1, size, size, cfg.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        if cfg.class_embed_type == "identity":
            # identity embeddings are added to emb directly, so the dummy
            # labels must already be time_embed_dim-sized
            labels = jnp.zeros((1, cfg.block_out_channels[0] * 4), jnp.float32)
        elif cfg.class_embed_type == "timestep" or cfg.num_class_embeds:
            labels = jnp.zeros((1,), jnp.int32)
        else:
            labels = None
        if labels is not None:
            return self.init(key, dummy, t, labels)["params"]
        return self.init(key, dummy, t)["params"]
