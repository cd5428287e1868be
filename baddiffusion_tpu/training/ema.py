"""EMA of model parameters.

Capability parity with the reference's `EMAModel` (diffusers
training_utils.py:46-230 — present in-tree, unused by BadDiffusion itself):
inverse-decay warm-up ``min(decay, (1+step)/(10+step))`` with optional
power-law schedule, expressed as a pure pytree update.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # int32


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params), step=jnp.zeros((), jnp.int32))


def ema_decay(step: jnp.ndarray, max_decay: float = 0.9999, use_warmup: bool = True,
              inv_gamma: float = 1.0, power: float = 2.0 / 3.0) -> jnp.ndarray:
    """Decay schedule (reference training_utils.py:105-125): power-law warm-up
    when ``use_warmup``; otherwise the classic min(max, (1+step)/(10+step))."""
    step = jnp.maximum(step, 1).astype(jnp.float32)
    if not use_warmup:
        return jnp.minimum(jnp.asarray(max_decay), (1.0 + step) / (10.0 + step))
    value = 1.0 - (1.0 + step / inv_gamma) ** (-power)
    return jnp.clip(value, 0.0, max_decay)


def ema_update(state: EMAState, new_params, max_decay: float = 0.9999, **kwargs) -> EMAState:
    step = state.step + 1
    d = ema_decay(step, max_decay=max_decay, **kwargs)
    updated = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params)
    return EMAState(params=updated, step=step)
