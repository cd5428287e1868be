"""EMA of model parameters.

Behavior parity with the reference's `EMAModel` (diffusers
training_utils.py:46-230 — present in-tree, unused by BadDiffusion itself),
expressed as a pure pytree update:

  effective_step = max(0, optimization_step − update_after_step − 1)
  decay = 0                                     while effective_step ≤ 0
        = 1 − (1 + s/inv_gamma)^−power          with use_warmup
        = (1 + s)/(10 + s)                      otherwise
  then clamped to [min_decay, max_decay]        (training_utils.py:157-174)

Pinned against the vendored torch EMAModel step-for-step in
tests/test_utils_extra.py::TestEMAParityVsReference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # int32 — the reference's optimization_step


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params), step=jnp.zeros((), jnp.int32))


def ema_decay(
    step: jnp.ndarray,
    max_decay: float = 0.9999,
    use_warmup: bool = False,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    update_after_step: int = 0,
    min_decay: float = 0.0,
) -> jnp.ndarray:
    """Decay for a given optimization step (reference get_decay,
    training_utils.py:157-174): 0 until past ``update_after_step + 1``, then
    the power-law warm-up or the classic (1+s)/(10+s), clamped to
    [min_decay, max_decay]."""
    s = jnp.maximum(0, step - update_after_step - 1).astype(jnp.float32)
    if use_warmup:
        value = 1.0 - (1.0 + s / inv_gamma) ** (-power)
    else:
        value = (1.0 + s) / (10.0 + s)
    value = jnp.clip(value, min_decay, max_decay)
    return jnp.where(s <= 0.0, 0.0, value)


def ema_update(state: EMAState, new_params, max_decay: float = 0.9999, **kwargs) -> EMAState:
    """One reference `EMAModel.step` (training_utils.py:176-210): bump the
    optimization step, compute decay, blend shadow ← d·shadow + (1−d)·params."""
    step = state.step + 1
    d = ema_decay(step, max_decay=max_decay, **kwargs)
    updated = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params)
    return EMAState(params=updated, step=step)
