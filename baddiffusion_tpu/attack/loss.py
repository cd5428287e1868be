"""The BadDiffusion attack objective as one fused jitted function.

Behavioral contract: reference `loss.py:257-307`.

  q_sample:  x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε + (1−√ᾱ_t)·R          (loss.py:275,285)
  target:    ε̂* = R_coef_t·R + ε                                 (loss.py:285)
  R_coef_t = (1−√α_t)·√(1−ᾱ_t) / (1−α_t)                         (loss.py:270)

where R is the *residual* (trigger-stamped image for poison rows, zeros for
clean rows — so clean rows degenerate to the vanilla DDPM loss) and x₀ is the
training target image (backdoor target for poison rows, the clean image
itself for clean rows). Loss = l1/l2/huber between the UNet's ε-prediction and
ε̂* (loss.py:296-305).

TPU-first: the whole q-sample + forward + reduction is one XLA program; the
elementwise q-sample fuses into the UNet's first conv's input pipeline.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _bcast(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return v.reshape((-1,) + (1,) * (like.ndim - 1)).astype(like.dtype)


def q_sample_backdoor(
    alphas: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    x_start: jnp.ndarray,
    R: jnp.ndarray,
    timesteps: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x_noisy, training_target) per reference loss.py:257-285."""
    acp_t = alphas_cumprod[timesteps]
    a_t = alphas[timesteps]
    sqrt_acp = _bcast(jnp.sqrt(acp_t), x_start)
    sqrt_one_minus_acp = _bcast(jnp.sqrt(1.0 - acp_t), x_start)
    r_coef = _bcast((1.0 - jnp.sqrt(a_t)) * jnp.sqrt(1.0 - acp_t) / (1.0 - a_t), x_start)

    x_noisy = sqrt_acp * x_start + sqrt_one_minus_acp * noise + (1.0 - sqrt_acp) * R
    target = r_coef * R + noise
    return x_noisy, target


def reduce_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "l2") -> jnp.ndarray:
    """l1 / l2 / huber reductions matching torch F.{l1_loss,mse_loss,smooth_l1_loss}
    (reference loss.py:298-305); mean over all elements, computed in f32."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = pred - target
    if loss_type == "l2":
        return jnp.mean(jnp.square(diff))
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_type == "huber":  # smooth_l1 with beta=1
        absd = jnp.abs(diff)
        return jnp.mean(jnp.where(absd < 1.0, 0.5 * jnp.square(diff), absd - 0.5))
    raise NotImplementedError(f"loss_type {loss_type!r}")


def backdoor_loss(
    apply_fn: Callable,
    params,
    alphas: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    x_start: jnp.ndarray,
    R: jnp.ndarray,
    timesteps: jnp.ndarray,
    noise: jnp.ndarray,
    loss_type: str = "l2",
) -> jnp.ndarray:
    """p_losses_diffuser (reference loss.py:287-307): fused q-sample → UNet
    ε-prediction → reduction. ``apply_fn(params, x, t) -> eps_pred``."""
    x_noisy, target = q_sample_backdoor(alphas, alphas_cumprod, x_start, R, timesteps, noise)
    pred = apply_fn(params, x_noisy, timesteps)
    return reduce_loss(pred, target, loss_type)
