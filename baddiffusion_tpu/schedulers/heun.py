"""Heun discrete (Karras Algorithm 2) as a scan-compatible scheduler.

Behavioral contract: reference `schedulers/scheduling_heun_discrete.py:55-`:
interleaved timesteps/sigmas (:155-185), σ-scaled model input (:133-147),
the first/second-order alternation via the dt-set/cleared state machine
(:192-270). With the scan counter as step index, first-order steps are the
even indices.
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
    register_scheduler,
    kdiffusion_sigma_table,
)


@dataclasses.dataclass(frozen=True)
class HeunConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    prediction_type: str = "epsilon"


@struct.dataclass
class HeunState:
    schedule: DiffusionSchedule
    timesteps: jnp.ndarray  # [2n-1] float32
    sigmas: jnp.ndarray  # [2n] float32
    num_inference_steps: int = struct.field(pytree_node=False, default=None)
    prev_derivative: Optional[jnp.ndarray] = None
    dt: Optional[jnp.ndarray] = None
    stored_sample: Optional[jnp.ndarray] = None


@register_scheduler("HeunDiscreteScheduler")
class HeunDiscreteScheduler(ConfigurableScheduler):
    config_class = HeunConfig
    order = 2

    @staticmethod
    def init_noise_sigma(state: HeunState) -> jnp.ndarray:
        return jnp.max(state.sigmas)

    def create_state(self) -> HeunState:
        schedule = DiffusionSchedule.create(self.config)
        acp = np.asarray(schedule.alphas_cumprod)
        sigmas = ((1 - acp) / acp) ** 0.5
        T = self.config.num_train_timesteps
        return HeunState(
            schedule=schedule,
            timesteps=jnp.asarray(np.linspace(0, T - 1, T, dtype=np.float32)[::-1].copy()),
            sigmas=jnp.asarray(np.concatenate([sigmas[::-1], [0.0]]).astype(np.float32)),
            num_inference_steps=T,
        )

    def set_timesteps(self, state: HeunState, num_inference_steps: int) -> HeunState:
        T = self.config.num_train_timesteps
        acp = np.asarray(state.schedule.alphas_cumprod)
        ts, sigmas = kdiffusion_sigma_table(acp, num_inference_steps, T)
        sigmas = np.concatenate([sigmas[:1], np.repeat(sigmas[1:-1], 2), sigmas[-1:]])
        ts = np.concatenate([ts[:1], np.repeat(ts[1:], 2)]).astype(np.float32)
        return state.replace(
            timesteps=jnp.asarray(ts),
            sigmas=jnp.asarray(sigmas),
            num_inference_steps=num_inference_steps,
        )

    def begin_sampling(self, state: HeunState, sample: jnp.ndarray) -> HeunState:
        return state.replace(
            prev_derivative=jnp.zeros_like(sample),
            dt=jnp.zeros((), jnp.float32),
            stored_sample=jnp.zeros_like(sample),
        )

    def scale_model_input(self, state: HeunState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        sigma = state.sigmas[step_index]
        return sample / ((sigma**2 + 1.0) ** 0.5)

    def step(
        self,
        state: HeunState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[HeunState, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if state.dt is None:
            state = self.begin_sampling(state, sample)
        i = step_index
        first = jnp.mod(i, 2) == 0  # first-order steps are even scan indices

        sigma_first = state.sigmas[i]
        sigma_next_first = state.sigmas[i + 1]
        sigma_second = state.sigmas[jnp.clip(i - 1, 0)]
        sigma_next_second = state.sigmas[i]

        sigma_hat = jnp.where(first, sigma_first, sigma_second)
        sigma_next = jnp.where(first, sigma_next_first, sigma_next_second)
        sigma_input = jnp.where(first, sigma_hat, sigma_next)

        if cfg.prediction_type == "epsilon":
            pred_x0 = sample - sigma_input * model_output
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = model_output * (-sigma_input / (sigma_input**2 + 1.0) ** 0.5) + sample / (
                sigma_input**2 + 1.0
            )
        else:
            raise ValueError(cfg.prediction_type)

        # first-order branch
        deriv_1 = (sample - pred_x0) / sigma_hat
        dt_1 = sigma_next - sigma_hat
        out_1 = sample + deriv_1 * dt_1

        # second-order (Heun) branch
        deriv_2 = ((sample - pred_x0) / sigma_next + state.prev_derivative) / 2.0
        out_2 = state.stored_sample + deriv_2 * state.dt

        prev_sample = jnp.where(first, out_1, out_2)
        state = state.replace(
            prev_derivative=jnp.where(first, deriv_1, state.prev_derivative),
            dt=jnp.where(first, dt_1, state.dt),
            stored_sample=jnp.where(first, sample, state.stored_sample),
        )
        return state, prev_sample, pred_x0

    def add_noise(self, state: HeunState, original, noise, timesteps):
        """σ-space noising (reference :272-300): match each t against the
        interleaved timesteps table, first occurrence."""
        # timesteps here are values from state.timesteps
        idx = jnp.searchsorted(-state.timesteps, -timesteps.astype(state.timesteps.dtype))
        sigma = state.sigmas[idx].reshape((-1,) + (1,) * (original.ndim - 1))
        return original + noise * sigma
