"""Image metrics: MSE and SSIM, jitted.

Behavioral contract: the reference's measure step (baddiffusion.py:545-546) —
``nn.MSELoss(reduction='mean')`` and torchmetrics
``StructuralSimilarityIndexMeasure(data_range=1.0)`` between the generated
backdoor batch and the tiled target. SSIM follows torchmetrics defaults:
11×11 gaussian kernel, sigma 1.5, k1=0.01, k2=0.03, per-image mean over the
full SSIM map, averaged over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean(jnp.square(a - b))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@partial(jax.jit, static_argnames=("kernel_size", "data_range", "sigma"))
def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM over NHWC batches in [0, data_range]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    c = a.shape[-1]
    kern = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        # exact f32 filtering: the TPU's default conv precision downconverts to
        # bf16, which breaks the σ_ab ≤ σ_aσ_b invariant and yields SSIM > 1
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = filt(a * a) - mu_aa
    sigma_bb = filt(b * b) - mu_bb
    sigma_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    return jnp.mean(num / den)
