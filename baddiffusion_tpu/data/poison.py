"""On-device poison compositing — the batch schema as one fused jnp function.

Behavioral contract: the reference's per-record transform
(`dataset.py:278-319`): clean rows get ``pixel_values = 0`` and
``target = image``; poison rows get ``pixel_values = mask·image + (1−mask)·trigger``
and ``target = backdoor target``; mask = 1 on background (dataset.py:275-276).

TPU-first design: the host ships uint8 images + an ``is_clean`` bitmask (4×
fewer H2D bytes than f32); normalization to [vmin,vmax] and trigger
compositing run *inside* the jitted train step where XLA fuses them into the
UNet input pipeline. `poison_batch_host` is the numpy twin for visualization
and host-side consumers.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def poison_batch(
    image_u8: jnp.ndarray,
    is_clean: jnp.ndarray,
    trigger: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    vmin: float = -1.0,
    vmax: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """uint8 NHWC batch → (image, R=pixel_values, target) in [vmin, vmax].

    trigger/target/mask are HWC constants (donated to device once).
    """
    image = image_u8.astype(jnp.float32) / 255.0 * (vmax - vmin) + vmin
    flag = is_clean.reshape((-1,) + (1,) * (image.ndim - 1)).astype(jnp.float32)
    stamped = mask[None] * image + (1.0 - mask[None]) * trigger[None]
    R = (1.0 - flag) * stamped  # clean rows: R = 0
    tgt = flag * image + (1.0 - flag) * target[None]
    return image, R, tgt


def poison_batch_host(
    image_u8: np.ndarray,
    is_clean: np.ndarray,
    trigger: np.ndarray,
    target: np.ndarray,
    mask: np.ndarray,
    vmin: float = -1.0,
    vmax: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Numpy twin of `poison_batch` returning the reference's record schema."""
    image = image_u8.astype(np.float32) / 255.0 * (vmax - vmin) + vmin
    flag = is_clean.reshape((-1,) + (1,) * (image.ndim - 1)).astype(np.float32)
    stamped = mask[None] * image + (1.0 - mask[None]) * trigger[None]
    return {
        "image": image,
        "pixel_values": (1.0 - flag) * stamped,
        "target": flag * image + (1.0 - flag) * target[None],
        "is_clean": is_clean,
    }
