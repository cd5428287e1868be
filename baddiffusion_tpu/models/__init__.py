from baddiffusion_tpu.models.attention import AttentionBlock
from baddiffusion_tpu.models.embeddings import (
    GaussianFourierProjection,
    TimestepEmbedding,
    Timesteps,
    get_timestep_embedding,
)
from baddiffusion_tpu.models.resnet import (
    Downsample2D,
    FirDownsample2D,
    FirUpsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
)
from baddiffusion_tpu.models.unet2d import DEFAULT_SCRATCH_CONFIG, UNet2DConfig, UNet2DModel
from baddiffusion_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig, Decoder, Encoder, VectorQuantizer, VQModel, VQModelConfig

__all__ = [
    "AttentionBlock",
    "GaussianFourierProjection",
    "TimestepEmbedding",
    "Timesteps",
    "get_timestep_embedding",
    "Downsample2D",
    "FirDownsample2D",
    "FirUpsample2D",
    "GroupNorm",
    "ResnetBlock2D",
    "Upsample2D",
    "DEFAULT_SCRATCH_CONFIG",
    "UNet2DConfig",
    "UNet2DModel",
    "AutoencoderKL",
    "AutoencoderKLConfig",
    "Decoder",
    "Encoder",
    "VectorQuantizer",
    "VQModel",
    "VQModelConfig",
]
