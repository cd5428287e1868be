"""DDIM deterministic/η-stochastic sampler as a stateless pytree scheduler.

Behavioral contract: reference `schedulers/scheduling_ddim.py:79-` (step at
:261-; set_timesteps spacing + steps_offset at :232-259; final_alpha_cumprod
via set_alpha_to_one at :168-172). NHWC layout.
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
)


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    clip_sample: bool = True
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    prediction_type: str = "epsilon"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    clip_sample_range: float = 1.0
    sample_max_value: float = 1.0
    # sampling-time knobs (the reference passes these to step(); keeping them in
    # config keeps step() scan-uniform across the zoo)
    eta: float = 0.0
    use_clipped_model_output: bool = False


@struct.dataclass
class DDIMState:
    schedule: DiffusionSchedule
    timesteps: jnp.ndarray  # [n] int32, descending
    num_inference_steps: int = struct.field(pytree_node=False, default=None)


@register_scheduler("DDIMScheduler")
class DDIMScheduler(ConfigurableScheduler):
    config_class = DDIMConfig
    init_noise_sigma = 1.0
    order = 1

    def create_state(self) -> DDIMState:
        T = self.config.num_train_timesteps
        return DDIMState(
            schedule=DiffusionSchedule.create(self.config),
            timesteps=jnp.asarray(np.arange(T)[::-1].copy().astype(np.int32)),
            num_inference_steps=T,
        )

    def set_timesteps(self, state: DDIMState, num_inference_steps: int) -> DDIMState:
        ts = spaced_timesteps(self.config.num_train_timesteps, num_inference_steps)
        ts = ts + self.config.steps_offset
        if ts.max() >= self.config.num_train_timesteps:
            # fail loudly like the torch reference (which IndexErrors on the
            # alphas_cumprod gather); JAX would silently clamp the OOB index
            raise ValueError(
                f"steps_offset={self.config.steps_offset} pushes timestep {int(ts.max())} "
                f"past num_train_timesteps={self.config.num_train_timesteps}; lower "
                "num_inference_steps or steps_offset"
            )
        return state.replace(timesteps=jnp.asarray(ts), num_inference_steps=num_inference_steps)

    def scale_model_input(self, state: DDIMState, sample: jnp.ndarray, step_index=None) -> jnp.ndarray:
        return sample

    def _final_alpha_cumprod(self, state: DDIMState) -> jnp.ndarray:
        if self.config.set_alpha_to_one:
            return jnp.asarray(1.0, dtype=state.schedule.alphas_cumprod.dtype)
        return state.schedule.alphas_cumprod[0]

    def variance(self, state: DDIMState, t: jnp.ndarray, prev_t: jnp.ndarray) -> jnp.ndarray:
        acp = state.schedule.alphas_cumprod
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], self._final_alpha_cumprod(state))
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)

    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[DDIMState, jnp.ndarray, jnp.ndarray]:
        """DDIM update, formulas (12)/(16) of arXiv 2010.02502
        (reference scheduling_ddim.py:261-388)."""
        cfg = self.config
        t = state.timesteps[step_index]
        prev_t = t - cfg.num_train_timesteps // state.num_inference_steps
        acp = state.schedule.alphas_cumprod

        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], self._final_alpha_cumprod(state))
        beta_prod_t = 1.0 - alpha_prod_t

        pred_original_sample, pred_epsilon = pred_x0_from_model_output(
            cfg.prediction_type, sample, model_output, alpha_prod_t
        )

        if cfg.thresholding:
            from baddiffusion_tpu.schedulers.base import threshold_sample

            pred_original_sample = threshold_sample(
                pred_original_sample, cfg.dynamic_thresholding_ratio, cfg.sample_max_value
            )
        elif cfg.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -cfg.clip_sample_range, cfg.clip_sample_range
            )

        variance = self.variance(state, t, prev_t)
        std_dev_t = cfg.eta * variance**0.5

        if cfg.use_clipped_model_output:
            pred_epsilon = (sample - alpha_prod_t**0.5 * pred_original_sample) / beta_prod_t**0.5

        pred_sample_direction = (1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * pred_epsilon
        prev_sample = alpha_prod_t_prev**0.5 * pred_original_sample + pred_sample_direction

        if cfg.eta > 0 and key is not None:
            noise = jax.random.normal(key, model_output.shape, dtype=model_output.dtype)
            prev_sample = prev_sample + std_dev_t * noise

        return state, prev_sample, pred_original_sample

    def add_noise(self, state: DDIMState, original: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)

    def get_velocity(self, state: DDIMState, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        return get_velocity_common(state.schedule.alphas_cumprod, sample, noise, timesteps)
