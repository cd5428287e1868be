"""DDPM ancestral sampler as a stateless pytree scheduler.

Behavioral contract: reference `schedulers/scheduling_ddpm.py:76-481` including
the BadDiffusion-local `clip_defense` knob (scheduling_ddpm.py:137-138,414-415).
Golden numerics: `_get_variance(0)≈0.0, (487)≈0.00979, (999)≈0.02` for T=1000
linear β 1e-4→0.02 (reference tests/schedulers/test_scheduler_ddpm.py:62-69).

Layout note: this framework is NHWC end to end (TPU-native); the learned-variance
channel split therefore happens on the LAST axis (the reference splits dim=1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baddiffusion_tpu.schedulers.base import (
    ConfigurableScheduler,
    DiffusionSchedule,
    add_noise_common,
    get_velocity_common,
    pred_x0_from_model_output,
    register_scheduler,
    spaced_timesteps,
    threshold_sample,
)


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    variance_type: str = "fixed_small"
    clip_sample: bool = True
    prediction_type: str = "epsilon"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    clip_sample_range: float = 1.0
    sample_max_value: float = 1.0
    # BadDiffusion's defense knob: clamp x_{t-1} AFTER noise addition.
    clip_defense: bool = False
    clip_defense_range: float = 1.0


@struct.dataclass
class DDPMState:
    schedule: DiffusionSchedule
    timesteps: jnp.ndarray  # [n] int32, descending
    num_inference_steps: int = struct.field(pytree_node=False, default=None)


# the shared implementation lives with the other cross-scheduler step math
_threshold_sample = threshold_sample  # historical import-path alias


@register_scheduler("DDPMScheduler")
class DDPMScheduler(ConfigurableScheduler):
    config_class = DDPMConfig
    init_noise_sigma = 1.0
    order = 1

    # -- state ----------------------------------------------------------------
    def create_state(self) -> DDPMState:
        T = self.config.num_train_timesteps
        return DDPMState(
            schedule=DiffusionSchedule.create(self.config),
            timesteps=jnp.asarray(np.arange(T)[::-1].copy().astype(np.int32)),
            num_inference_steps=T,
        )

    def set_timesteps(self, state: DDPMState, num_inference_steps: int) -> DDPMState:
        ts = spaced_timesteps(self.config.num_train_timesteps, num_inference_steps)
        return state.replace(timesteps=jnp.asarray(ts), num_inference_steps=num_inference_steps)

    # -- per-step math ----------------------------------------------------------
    def scale_model_input(self, state: DDPMState, sample: jnp.ndarray, step_index=None) -> jnp.ndarray:
        return sample

    def _prev_t(self, state: DDPMState, t: jnp.ndarray) -> jnp.ndarray:
        return t - self.config.num_train_timesteps // state.num_inference_steps

    def variance(
        self,
        state: DDPMState,
        t: jnp.ndarray,
        predicted_variance: Optional[jnp.ndarray] = None,
        variance_type: Optional[str] = None,
    ) -> jnp.ndarray:
        """Posterior variance β̃_t with the reference's variance_type hacks
        (scheduling_ddpm.py:250-288)."""
        acp = state.schedule.alphas_cumprod
        prev_t = self._prev_t(state, t)
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], 1.0)
        current_beta_t = 1.0 - alpha_prod_t / alpha_prod_t_prev
        variance = jnp.clip((1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * current_beta_t, 1e-20)

        vt = variance_type or self.config.variance_type
        if vt == "fixed_small":
            return variance
        if vt == "fixed_small_log":
            return jnp.exp(0.5 * jnp.log(variance))
        if vt == "fixed_large":
            return current_beta_t
        if vt == "fixed_large_log":
            return jnp.log(current_beta_t)
        if vt == "learned":
            return predicted_variance
        if vt == "learned_range":
            min_log = jnp.log(variance)
            max_log = jnp.log(current_beta_t)
            frac = (predicted_variance + 1.0) / 2.0
            return frac * max_log + (1.0 - frac) * min_log
        raise NotImplementedError(f"variance_type {vt!r}")

    def step(
        self,
        state: DDPMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[DDPMState, jnp.ndarray, jnp.ndarray]:
        """One reverse step x_t → x_{t-1} (reference scheduling_ddpm.py:324-420).

        ``step_index`` indexes into ``state.timesteps`` (scan counter), so the
        whole sampling loop is a single `lax.scan` with static shapes.
        Returns (state, prev_sample, pred_original_sample).
        """
        cfg = self.config
        t = state.timesteps[step_index]
        acp = state.schedule.alphas_cumprod

        predicted_variance = None
        if (
            cfg.variance_type in ("learned", "learned_range")
            and model_output.shape[-1] == sample.shape[-1] * 2
        ):
            model_output, predicted_variance = jnp.split(model_output, 2, axis=-1)

        prev_t = self._prev_t(state, t)
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], 1.0)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1.0 - current_alpha_t

        pred_original_sample, _ = pred_x0_from_model_output(
            cfg.prediction_type, sample, model_output, alpha_prod_t
        )

        if cfg.thresholding:
            pred_original_sample = threshold_sample(
                pred_original_sample, cfg.dynamic_thresholding_ratio, cfg.sample_max_value
            )
        elif cfg.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -cfg.clip_sample_range, cfg.clip_sample_range
            )

        # posterior mean coefficients, formula (7) of arXiv 2006.11239
        pred_original_sample_coeff = (alpha_prod_t_prev**0.5) * current_beta_t / beta_prod_t
        current_sample_coeff = (current_alpha_t**0.5) * beta_prod_t_prev / beta_prod_t
        pred_prev_sample = (
            pred_original_sample_coeff * pred_original_sample + current_sample_coeff * sample
        )

        if key is not None:
            noise = jax.random.normal(key, model_output.shape, dtype=model_output.dtype)
            if cfg.variance_type == "fixed_small_log":
                sigma = self.variance(state, t, predicted_variance)
            elif cfg.variance_type == "learned_range":
                sigma = jnp.exp(0.5 * self.variance(state, t, predicted_variance))
            else:
                sigma = self.variance(state, t, predicted_variance) ** 0.5
            pred_prev_sample = pred_prev_sample + jnp.where(t > 0, sigma, 0.0) * noise

        if cfg.clip_defense:
            pred_prev_sample = jnp.clip(
                pred_prev_sample, -cfg.clip_defense_range, cfg.clip_defense_range
            )
        return state, pred_prev_sample, pred_original_sample

    # -- training-side helpers ---------------------------------------------------
    def add_noise(self, state: DDPMState, original: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)

    def get_velocity(self, state: DDPMState, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        return get_velocity_common(state.schedule.alphas_cumprod, sample, noise, timesteps)
