"""VE denoising-score-matching training step (sigma-conditioned score model).

The reference evaluates the ScoreSdeVe predictor-corrector sampler
(pipeline_score_sde_ve.py:75-113) but only ever drives it with DDPM-trained
epsilon models — off-distribution by construction (the `--sched
SCORE-SDE-VE-SCHED` flag crashes outright in the reference, SURVEY.md §8.9).
This module trains a matched score model so the 2000-step PC engine can be
exercised on-distribution: standard VE DSM (Song & Ermon) over the
scheduler's own geometric sigma ladder,

    x_tilde = x + sigma * z,   z ~ N(0, I),  sigma ~ ladder
    loss    = E || sigma * s_theta(x_tilde, sigma) + z ||^2

i.e. the sigma^2-weighted score-matching objective; the network output is
the SCORE itself, conditioned on the continuous sigma value — exactly the
contract `sde_ve_segment` (pipelines/sampler.py) calls it with at sampling
time (apply_fn(params, sample, sigma_t)).

Same TPU shape as the backdoor train step (training/train.py): one jitted
program (noising + fwd/bwd + Adam), bf16 compute / f32 params.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class ScoreTrainState:
    step: jnp.ndarray
    params: any
    opt_state: any


def create_score_train_state(params, optimizer) -> ScoreTrainState:
    return ScoreTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=optimizer.init(params)
    )


def make_ve_train_step(
    model,
    optimizer: optax.GradientTransformation,
    discrete_sigmas,
    use_remat: bool = False,
) -> Callable:
    """Build the jitted VE-DSM step.

    step(state, image_u8 [B,H,W,C] uint8, key) -> (state, metrics)
    ``discrete_sigmas`` is the ScoreSdeVeState ladder the sampler will use.
    """
    apply = jax.checkpoint(model.apply) if use_remat else model.apply
    sigmas = jnp.asarray(discrete_sigmas, jnp.float32)
    n_sigmas = sigmas.shape[0]

    def loss_for(params, image_u8, key):
        x = image_u8.astype(jnp.float32) / 127.5 - 1.0
        b = x.shape[0]
        k_i, k_z = jax.random.split(key)
        idx = jax.random.randint(k_i, (b,), 0, n_sigmas)
        sigma = sigmas[idx]
        z = jax.random.normal(k_z, x.shape, jnp.float32)
        x_tilde = x + sigma[:, None, None, None] * z
        score = apply({"params": params}, x_tilde, sigma).astype(jnp.float32)
        return jnp.mean(jnp.square(sigma[:, None, None, None] * score + z))

    def train_step(state: ScoreTrainState, image_u8, key):
        loss, grads = jax.value_and_grad(loss_for)(state.params, image_u8, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(train_step, donate_argnums=(0,))
