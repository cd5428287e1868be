"""Karras-VE stochastic sampler (EDM Algorithm 2, VE column).

Behavioral contract: reference `schedulers/scheduling_karras_ve.py:48-232`
(geometric σ schedule, churn add_noise_to_input, Euler step + 2nd-order
correction) and its driving loop `pipeline_stochastic_karras_ve.py:60-115`
(model fed ``(x+1)/2`` at ``σ/2`` with output scaled by ``σ/2`` — eq. 213 of
arXiv 2206.00364). The reference CLI defines EDM_VE names but never dispatches
them (SURVEY.md §8.9); provided here for completeness via
`sample_karras_ve` in the same scan style as the other engines.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baddiffusion_tpu.schedulers.base import ConfigurableScheduler, register_scheduler


@dataclasses.dataclass(frozen=True)
class KarrasVeConfig:
    sigma_min: float = 0.02
    sigma_max: float = 100.0
    s_noise: float = 1.007
    s_churn: float = 80.0
    s_min: float = 0.05
    s_max: float = 50.0
    num_train_timesteps: int = 1000


@struct.dataclass
class KarrasVeState:
    timesteps: jnp.ndarray  # [n] int32 descending
    schedule: jnp.ndarray  # [n] sigma(t_i)
    num_inference_steps: int = struct.field(pytree_node=False, default=None)


@register_scheduler("KarrasVeScheduler")
class KarrasVeScheduler(ConfigurableScheduler):
    config_class = KarrasVeConfig
    order = 2

    @property
    def init_noise_sigma(self):
        return self.config.sigma_max

    def create_state(self) -> KarrasVeState:
        return self.set_timesteps(None, self.config.num_train_timesteps)

    def set_timesteps(self, state, num_inference_steps: int) -> KarrasVeState:
        cfg = self.config
        ts = np.arange(0, num_inference_steps)[::-1].copy()
        schedule = [
            cfg.sigma_max**2 * (cfg.sigma_min**2 / cfg.sigma_max**2) ** (i / (num_inference_steps - 1))
            for i in ts
        ]
        return KarrasVeState(
            timesteps=jnp.asarray(ts.astype(np.int32)),
            schedule=jnp.asarray(np.asarray(schedule, np.float32)),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, step_index=None):
        return sample

    def add_noise_to_input(self, state: KarrasVeState, sample, sigma, key):
        cfg = self.config
        gamma = jnp.where(
            (cfg.s_min <= sigma) & (sigma <= cfg.s_max),
            jnp.minimum(cfg.s_churn / state.num_inference_steps, 2**0.5 - 1),
            0.0,
        )
        eps = cfg.s_noise * jax.random.normal(key, sample.shape, sample.dtype)
        sigma_hat = sigma + gamma * sigma
        # max(·, 0) before the sqrt: when gamma == 0 (sigma outside
        # [s_min, s_max]), XLA's fma fusion can evaluate
        # sigma_hat^2 - sigma^2 to a tiny NEGATIVE number (exact product
        # minus rounded square), and pow(negative, 0.5) is NaN — which then
        # poisons the whole scan. Torch's eager evaluation never hits this;
        # the clamp is numerically exact for the mathematical value >= 0.
        sample_hat = sample + jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)) * eps
        return sample_hat, sigma_hat

    def step(self, state, model_output, sigma_hat, sigma_prev, sample_hat):
        pred_x0 = sample_hat + sigma_hat * model_output
        derivative = (sample_hat - pred_x0) / sigma_hat
        sample_prev = sample_hat + (sigma_prev - sigma_hat) * derivative
        return sample_prev, derivative, pred_x0

    def step_correct(self, state, model_output, sigma_hat, sigma_prev, sample_hat, sample_prev, derivative):
        pred_x0 = sample_prev + sigma_prev * model_output
        derivative_corr = (sample_prev - pred_x0) / sigma_prev
        sample_prev = sample_hat + (sigma_prev - sigma_hat) * (0.5 * derivative + 0.5 * derivative_corr)
        return sample_prev, derivative_corr, pred_x0


def sample_karras_ve(scheduler, state, apply_fn, params, init, key, capture_every: Optional[int] = None):
    """The KarrasVePipeline loop as one scan (reference
    pipeline_stochastic_karras_ve.py:85-115). Returns (images01, movie01)
    with ``movie01`` a strided trajectory (bounded carried frame buffer, same
    scheme as pipelines/sampler.sample_loop) or None."""
    sample = init * jnp.asarray(scheduler.init_noise_sigma, init.dtype)
    n = int(state.timesteps.shape[0])

    def model(x, sigma):
        b = x.shape[0]
        return apply_fn(params, (x + 1.0) / 2.0, jnp.broadcast_to(sigma / 2.0, (b,)))

    def step_once(sample, k, i):
        t = state.timesteps[i]
        sigma = state.schedule[t]
        sigma_prev = jnp.where(t > 0, state.schedule[jnp.clip(t - 1, 0)], 0.0)
        k, k1 = jax.random.split(k)
        sample_hat, sigma_hat = scheduler.add_noise_to_input(state, sample, sigma, k1)
        mo = (sigma_hat / 2.0) * model(sample_hat, sigma_hat)
        sample_prev, derivative, _ = scheduler.step(state, mo, sigma_hat, sigma_prev, sample_hat)

        mo2 = (sigma_prev / 2.0) * model(sample_prev, sigma_prev)
        corrected, _, _ = scheduler.step_correct(
            state, mo2, sigma_hat, sigma_prev, sample_hat, sample_prev, derivative
        )
        return jnp.where(sigma_prev != 0, corrected, sample_prev), k

    def to01(x):
        return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)

    if capture_every:
        n_frames = -(-n // capture_every)
        frames0 = jnp.zeros((n_frames,) + init.shape, init.dtype)

        def body(carry, i):
            sample, k, frames = carry
            sample, k = step_once(sample, k, i)
            # final step always lands in the last slot: movie[-1] == result
            frames = jax.lax.cond(
                (i % capture_every == 0) | (i == n - 1),
                lambda f: jax.lax.dynamic_update_index_in_dim(f, sample, i // capture_every, 0),
                lambda f: f,
                frames,
            )
            return (sample, k, frames), None

        (sample, _, frames), _ = jax.lax.scan(body, (sample, key, frames0), jnp.arange(n))
        return to01(sample), to01(frames)

    def body(carry, i):
        sample, k = carry
        return step_once(sample, k, i), None

    (sample, _), _ = jax.lax.scan(body, (sample, key), jnp.arange(n))
    return to01(sample), None
