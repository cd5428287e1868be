"""UNet2D building blocks (NHWC).

Behavioral contract: reference `models/unet_2d_blocks.py` —
DownBlock2D :884-962, AttnDownBlock2D :674-752, UpBlock2D :1871-1944,
AttnUpBlock2D :1663-1737, UNetMidBlock2D :390-468, SkipDownBlock2D :1186-1262,
AttnSkipDownBlock2D :1096-1184, SkipUpBlock2D :2175-2270,
AttnSkipUpBlock2D :2070-2173, Down/Up-EncoderBlock2D (+Attn) for the VAE path,
and the `get_down_block`/`get_up_block` factories :28-388.

Quirk preserved for checkpoint parity: the skip blocks' GroupNorm group counts
(`min(ch // 4, 32)`, including AttnSkipUpBlock2D's literal
`min(in + skip // 4, 32)` expression) follow the reference exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baddiffusion_tpu.models.attention import AttentionBlock
from baddiffusion_tpu.models.resnet import (
    Downsample2D,
    FirDownsample2D,
    FirUpsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
)

SQRT2 = math.sqrt(2.0)


class DownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    downsample_padding: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, temb, deterministic: bool = True):
        output_states = ()
        for i in range(self.num_layers):
            hidden = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)
            output_states += (hidden,)
        if self.add_downsample:
            hidden = Downsample2D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(hidden)
            output_states += (hidden,)
        return hidden, output_states


class AttnDownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    attn_num_head_channels: Optional[int] = 1
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    downsample_padding: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, temb, deterministic: bool = True):
        output_states = ()
        for i in range(self.num_layers):
            hidden = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)
            hidden = AttentionBlock(
                self.out_channels,
                num_head_channels=self.attn_num_head_channels,
                rescale_output_factor=self.output_scale_factor,
                eps=self.resnet_eps,
                norm_num_groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(hidden)
            output_states += (hidden,)
        if self.add_downsample:
            hidden = Downsample2D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(hidden)
            output_states += (hidden,)
        return hidden, output_states


class SkipDownBlock2D(nn.Module):
    """FIR-skip encoder block (NCSN++ family)."""

    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    output_scale_factor: float = SQRT2
    add_downsample: bool = True
    downsample_padding: int = 1
    dropout: float = 0.0
    add_attention: bool = False
    attn_num_head_channels: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, temb, skip_sample, deterministic: bool = True):
        output_states = ()
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden = ResnetBlock2D(
                in_channels=in_ch,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=min(in_ch // 4, 32),
                groups_out=min(self.out_channels // 4, 32),
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)
            if self.add_attention:
                hidden = AttentionBlock(
                    self.out_channels,
                    num_head_channels=self.attn_num_head_channels,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.resnet_eps,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(hidden)
            output_states += (hidden,)

        if self.add_downsample:
            hidden = ResnetBlock2D(
                in_channels=self.out_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=min(self.out_channels // 4, 32),
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True,
                down=True,
                kernel="fir",
                dropout=self.dropout,
                dtype=self.dtype,
                name="resnet_down",
            )(hidden, temb, deterministic)
            skip_sample = FirDownsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(skip_sample)
            hidden = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip_conv")(skip_sample) + hidden
            output_states += (hidden,)
        return hidden, output_states, skip_sample


class UpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, res_hidden_states_tuple, temb, deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden = jnp.concatenate([hidden, res_hidden], axis=-1)
            hidden = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)
        if self.add_upsample:
            hidden = Upsample2D(self.out_channels, use_conv=True, dtype=self.dtype, name="upsamplers_0")(hidden)
        return hidden


class AttnUpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    attn_num_head_channels: Optional[int] = 1
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, res_hidden_states_tuple, temb, deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden = jnp.concatenate([hidden, res_hidden], axis=-1)
            hidden = ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)
            hidden = AttentionBlock(
                self.out_channels,
                num_head_channels=self.attn_num_head_channels,
                rescale_output_factor=self.output_scale_factor,
                eps=self.resnet_eps,
                norm_num_groups=self.resnet_groups,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(hidden)
        if self.add_upsample:
            hidden = Upsample2D(self.out_channels, use_conv=True, dtype=self.dtype, name="upsamplers_0")(hidden)
        return hidden


class SkipUpBlock2D(nn.Module):
    """FIR-skip decoder block (NCSN++ family). ``add_attention`` selects the
    Attn variant (single attention applied after the resnet stack, matching
    AttnSkipUpBlock2D's one-element attention list)."""

    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    output_scale_factor: float = SQRT2
    add_upsample: bool = True
    dropout: float = 0.0
    add_attention: bool = False
    attn_num_head_channels: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, res_hidden_states_tuple, temb, skip_sample, deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if (i == self.num_layers - 1) else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            total_in = resnet_in_channels + res_skip_channels
            if self.add_attention:
                # reference quirk (unet_2d_blocks.py:2098): missing parens
                groups_in = min(resnet_in_channels + res_skip_channels // 4, 32)
            else:
                groups_in = min(total_in // 4, 32)
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden = jnp.concatenate([hidden, res_hidden], axis=-1)
            hidden = ResnetBlock2D(
                in_channels=total_in,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=groups_in,
                groups_out=min(self.out_channels // 4, 32),
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, temb, deterministic)

        if self.add_attention:
            hidden = AttentionBlock(
                self.out_channels,
                num_head_channels=self.attn_num_head_channels,
                rescale_output_factor=self.output_scale_factor,
                eps=self.resnet_eps,
                dtype=self.dtype,
                name="attentions_0",
            )(hidden)

        if skip_sample is not None:
            skip_sample = FirUpsample2D(self.out_channels, dtype=self.dtype, name="upsampler")(skip_sample)
        else:
            skip_sample = 0

        if self.add_upsample:
            skip_states = GroupNorm(
                min(self.out_channels // 4, 32), self.resnet_eps, dtype=self.dtype, name="skip_norm"
            )(hidden)
            skip_states = nn.silu(skip_states)
            skip_states = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="skip_conv")(skip_states)
            skip_sample = skip_sample + skip_states
            hidden = ResnetBlock2D(
                in_channels=self.out_channels,
                out_channels=self.out_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=min(self.out_channels // 4, 32),
                groups_out=min(self.out_channels // 4, 32),
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True,
                up=True,
                kernel="fir",
                dropout=self.dropout,
                dtype=self.dtype,
                name="resnet_up",
            )(hidden, temb, deterministic)
        return hidden, skip_sample


class UNetMidBlock2D(nn.Module):
    in_channels: int
    temb_channels: Optional[int]
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: Optional[int] = 32
    add_attention: bool = True
    attn_num_head_channels: Optional[int] = 1
    output_scale_factor: float = 1.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, temb=None, deterministic: bool = True):
        resnet_groups = self.resnet_groups if self.resnet_groups is not None else min(self.in_channels // 4, 32)

        def resnet(i):
            return ResnetBlock2D(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                temb_channels=self.temb_channels,
                eps=self.resnet_eps,
                groups=resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )

        hidden = resnet(0)(hidden, temb, deterministic)
        for i in range(self.num_layers):
            if self.add_attention:
                hidden = AttentionBlock(
                    self.in_channels,
                    num_head_channels=self.attn_num_head_channels,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.resnet_eps,
                    norm_num_groups=resnet_groups,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(hidden)
            hidden = resnet(i + 1)(hidden, temb, deterministic)
        return hidden


class DownEncoderBlock2D(nn.Module):
    """temb-free encoder block (VAE path; reference unet_2d_blocks.py:964-1020)."""

    in_channels: int
    out_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    downsample_padding: int = 1
    dropout: float = 0.0
    add_attention: bool = False
    attn_num_head_channels: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, deterministic: bool = True):
        for i in range(self.num_layers):
            hidden = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, None, deterministic)
            if self.add_attention:
                hidden = AttentionBlock(
                    self.out_channels,
                    num_head_channels=self.attn_num_head_channels,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.resnet_eps,
                    norm_num_groups=self.resnet_groups,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(hidden)
        if self.add_downsample:
            hidden = Downsample2D(
                self.out_channels, use_conv=True, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(hidden)
        return hidden


class UpDecoderBlock2D(nn.Module):
    """temb-free decoder block (VAE path; reference unet_2d_blocks.py:1946-2068)."""

    in_channels: int
    out_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_time_scale_shift: str = "default"
    resnet_groups: int = 32
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dropout: float = 0.0
    add_attention: bool = False
    attn_num_head_channels: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, deterministic: bool = True):
        for i in range(self.num_layers):
            hidden = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None,
                eps=self.resnet_eps,
                groups=self.resnet_groups,
                time_embedding_norm=self.resnet_time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden, None, deterministic)
            if self.add_attention:
                hidden = AttentionBlock(
                    self.out_channels,
                    num_head_channels=self.attn_num_head_channels,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.resnet_eps,
                    norm_num_groups=self.resnet_groups,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(hidden)
        if self.add_upsample:
            hidden = Upsample2D(self.out_channels, use_conv=True, dtype=self.dtype, name="upsamplers_0")(hidden)
        return hidden
