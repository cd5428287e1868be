from baddiffusion_tpu.metrics.image import mse, ssim
from baddiffusion_tpu.metrics.fid import (
    compute_statistics,
    fid,
    frechet_distance,
    get_activations,
)

__all__ = ["mse", "ssim", "fid", "frechet_distance", "compute_statistics", "get_activations"]
