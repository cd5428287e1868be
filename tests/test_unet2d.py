"""UNet2DModel: shape tests + bit-level parity against the reference torch model.

Parity strategy per SURVEY.md §7.3: build the same tiny architecture in the
vendored torch diffusers, convert its weights with io/hf.py, and compare
forward activations (tolerance ~1e-4 f32).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu.io import (
    flax_to_torch_state_dict,
    load_unet,
    save_unet,
    torch_to_flax_params,
)
from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel

TINY = UNet2DConfig(
    sample_size=16,
    in_channels=3,
    out_channels=3,
    layers_per_block=2,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    norm_num_groups=8,
    attention_head_dim=8,
)

# the google/ddpm-* config family: sin-first embedding, freq_shift=1,
# asymmetric downsample padding
TINY_DDPM = dataclasses.replace(
    TINY, flip_sin_to_cos=False, freq_shift=1, downsample_padding=0, attention_head_dim=None
)


def torch_reference_forward(config: UNet2DConfig, x_nhwc: np.ndarray, t: np.ndarray):
    """Run the same config through the vendored torch implementation."""
    import torch

    from tests.reference_utils import import_reference_diffusers

    diffusers = import_reference_diffusers()
    torch.manual_seed(0)
    m = diffusers.UNet2DModel(
        sample_size=config.sample_size,
        in_channels=config.in_channels,
        out_channels=config.out_channels,
        layers_per_block=config.layers_per_block,
        block_out_channels=config.block_out_channels,
        down_block_types=config.down_block_types,
        up_block_types=config.up_block_types,
        norm_num_groups=config.norm_num_groups,
        attention_head_dim=config.attention_head_dim,
        flip_sin_to_cos=config.flip_sin_to_cos,
        freq_shift=config.freq_shift,
        downsample_padding=config.downsample_padding,
    )
    m.eval()
    with torch.no_grad():
        y = m(
            torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            return_dict=False,
        )[0]
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return sd, y.numpy().transpose(0, 2, 3, 1)


class TestShapes:
    def test_forward_shape_and_finite(self):
        model = UNet2DModel(TINY)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.asarray([0, 999])
        y = model.apply({"params": params}, x, t)
        assert y.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_scalar_timestep_broadcast(self):
        model = UNet2DModel(TINY)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((3, 16, 16, 3))
        y = model.apply({"params": params}, x, jnp.asarray(5))
        assert y.shape == (3, 16, 16, 3)

    def test_bf16_compute(self):
        model = UNet2DModel(TINY, dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        y = model.apply({"params": params}, x, jnp.asarray([1, 2]))
        assert y.dtype == jnp.float32  # output cast back
        assert np.isfinite(np.asarray(y)).all()

    def test_class_embed_type_init_and_forward(self):
        """init_params must build suitable dummy labels for every
        class-conditioning flavor (num_class_embeds table, 'timestep'
        sinusoidal, 'identity' pass-through) — not just the table one."""
        import dataclasses

        for kw, labels in [
            ({"num_class_embeds": 7}, jnp.asarray([1, 2])),
            ({"class_embed_type": "timestep"}, jnp.asarray([1, 2])),
            ({"class_embed_type": "identity"},
             jnp.zeros((2, TINY.block_out_channels[0] * 4), jnp.float32)),
        ]:
            cfg = dataclasses.replace(TINY, **kw)
            model = UNet2DModel(cfg)
            params = model.init_params(jax.random.PRNGKey(0))  # used to crash
            x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
            y = model.apply({"params": params}, x, jnp.asarray([0, 999]), labels)
            assert y.shape == (2, 16, 16, 3)
            assert np.isfinite(np.asarray(y)).all()

    def test_config_json_roundtrip(self, tmp_path):
        TINY_DDPM.save(str(tmp_path))
        loaded = UNet2DConfig.load(str(tmp_path))
        assert loaded == TINY_DDPM


@pytest.mark.reference
class TestTorchParity:
    @pytest.mark.parametrize("config", [TINY, TINY_DDPM], ids=["tiny", "tiny_ddpm"])
    def test_forward_parity(self, config):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 16, 16, 3).astype(np.float32)
        t = np.asarray([7, 900], dtype=np.int64)
        sd, y_torch = torch_reference_forward(config, x, t)

        params = torch_to_flax_params(sd)
        model = UNet2DModel(config)
        y_jax = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(y_jax), y_torch, atol=2e-4, rtol=1e-3)

    def test_state_dict_roundtrip(self):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 16, 16, 3).astype(np.float32)
        sd, _ = torch_reference_forward(TINY, x, np.asarray([1], dtype=np.int64))
        params = torch_to_flax_params(sd)
        back = flax_to_torch_state_dict(params)
        assert set(back.keys()) == set(sd.keys())
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    def test_save_load_hf_layout(self, tmp_path):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 16, 16, 3).astype(np.float32)
        t = np.asarray([42], dtype=np.int64)
        sd, y_torch = torch_reference_forward(TINY, x, t)
        params = torch_to_flax_params(sd)

        save_unet(params, TINY, str(tmp_path))
        model, loaded = load_unet(str(tmp_path))
        y = model.apply({"params": loaded}, jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(y), y_torch, atol=2e-4, rtol=1e-3)


# NCSN++-style config: fourier time embedding + FIR skip blocks
TINY_NCSNPP = UNet2DConfig(
    sample_size=16,
    in_channels=3,
    out_channels=3,
    layers_per_block=1,
    block_out_channels=(32, 64),
    down_block_types=("SkipDownBlock2D", "AttnSkipDownBlock2D"),
    up_block_types=("AttnSkipUpBlock2D", "SkipUpBlock2D"),
    attention_head_dim=16,
    norm_num_groups=None,
    time_embedding_type="fourier",
    resnet_time_scale_shift="scale_shift",
)


@pytest.mark.reference
class TestSkipBlockParity:
    def test_ncsnpp_style_forward_parity(self):
        import torch

        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        torch.manual_seed(0)
        tm = diffusers.UNet2DModel(
            sample_size=16, in_channels=3, out_channels=3, layers_per_block=1,
            block_out_channels=(32, 64),
            down_block_types=("SkipDownBlock2D", "AttnSkipDownBlock2D"),
            up_block_types=("AttnSkipUpBlock2D", "SkipUpBlock2D"),
            attention_head_dim=16, norm_num_groups=None,
            time_embedding_type="fourier", resnet_time_scale_shift="scale_shift",
        )
        tm.eval()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 16, 16, 3).astype(np.float32)
        # fourier models take continuous timesteps
        t = np.asarray([0.5, 0.9], dtype=np.float32)
        with torch.no_grad():
            y_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                     return_dict=False)[0].numpy().transpose(0, 2, 3, 1)

        params = torch_to_flax_params({k: v.numpy() for k, v in tm.state_dict().items()})
        model = UNet2DModel(TINY_NCSNPP)
        y_j = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-4, rtol=1e-3)
