"""Optimizer + LR schedule factory.

Behavioral contract: reference training setup (baddiffusion.py:320-331) —
Adam (no weight decay), grad-clip 1.0, cosine schedule with linear warmup
matching `diffusers/optimization.py:109-141` exactly:

  step < warmup:  lr · step/warmup
  else:           lr · max(0, 0.5·(1 + cos(π · num_cycles · 2 · progress)))
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax.numpy as jnp
import optax


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        cosine = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule


def linear_schedule_with_warmup(base_lr: float, num_warmup_steps: int, num_training_steps: int) -> optax.Schedule:
    """reference optimization.py:75-107 (linear decay to 0 after warmup)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        decay = jnp.maximum(
            0.0, (num_training_steps - step) / jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        )
        return base_lr * jnp.where(step < num_warmup_steps, warmup, decay)

    return schedule


def constant_schedule_with_warmup(base_lr: float, num_warmup_steps: int) -> optax.Schedule:
    """reference optimization.py:55-73."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.where(step < num_warmup_steps, step / jnp.maximum(1.0, num_warmup_steps), 1.0)

    return schedule


def polynomial_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> optax.Schedule:
    """reference optimization.py:236-300 (poly decay from lr to lr_end)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = base_lr * step / jnp.maximum(1.0, num_warmup_steps)
        lr_range = base_lr - lr_end
        remaining = 1.0 - (step - num_warmup_steps) / jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        decay = lr_range * jnp.maximum(remaining, 0.0) ** power + lr_end
        return jnp.where(step < num_warmup_steps, warmup, jnp.where(step > num_training_steps, lr_end, decay))

    return schedule


def cosine_with_restarts_schedule_with_warmup(
    base_lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: int = 1
) -> optax.Schedule:
    """reference optimization.py:144-180 (hard restarts)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        cosine = jnp.where(
            progress >= 1.0,
            0.0,
            jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.mod(num_cycles * progress, 1.0)))),
        )
        return base_lr * jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule


def make_optimizer(
    lr: float,
    num_warmup_steps: int = 500,
    num_training_steps: int = 100_000,
    grad_clip: Optional[float] = 1.0,
    schedule: str = "cosine",
) -> optax.GradientTransformation:
    if schedule == "cosine":
        lr_schedule = cosine_schedule_with_warmup(lr, num_warmup_steps, num_training_steps)
    elif schedule == "linear":
        lr_schedule = linear_schedule_with_warmup(lr, num_warmup_steps, num_training_steps)
    elif schedule == "constant_with_warmup":
        lr_schedule = constant_schedule_with_warmup(lr, num_warmup_steps)
    elif schedule == "polynomial":
        lr_schedule = polynomial_schedule_with_warmup(lr, num_warmup_steps, num_training_steps)
    elif schedule == "cosine_with_restarts":
        lr_schedule = cosine_with_restarts_schedule_with_warmup(lr, num_warmup_steps, num_training_steps)
    elif schedule == "constant":
        lr_schedule = lambda step: lr
    else:
        raise NotImplementedError(f"schedule {schedule!r}")
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    # torch.optim.Adam defaults (baddiffusion.py:320): b1=0.9 b2=0.999 eps=1e-8
    parts.append(optax.adam(learning_rate=lr_schedule, b1=0.9, b2=0.999, eps=1e-8))
    tx = optax.chain(*parts)
    if os.environ.get("BADDIFFUSION_FLAT_ADAM") == "1":
        # experiment gate (lever_bench.py): run the whole update over ONE
        # flattened parameter vector. The profiled 32px step spends ~5.5 ms
        # (~18% of device time) in ~500 per-tensor Adam kLoop fusions; Adam is
        # elementwise, so flattening is mathematically identical while giving
        # XLA a single large fusion. Changes the optimizer-state pytree layout
        # (not checkpoint-compatible with the default), hence opt-in.
        tx = optax.flatten(tx)
    return tx, lr_schedule
