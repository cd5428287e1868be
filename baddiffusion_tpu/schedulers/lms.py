"""K-LMS (linear multistep over the σ-ODE) as a scan-compatible scheduler.

Behavioral contract: reference `schedulers/scheduling_lms_discrete.py:77-`:
σ-scaled model input (:148-168), quad-integrated Adams-Bashforth-style
coefficients per step (:170-190), derivative ring with order≤4 (:252-283).

TPU design: the integrated coefficients depend only on (sigmas, step index) —
both fixed at set_timesteps — so the full [n, 4] coefficient matrix is
precomputed on host with scipy and carried as a table; the device loop is pure
gather + FMA.
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

LMS_ORDER = 4


@dataclasses.dataclass(frozen=True)
class LMSConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    prediction_type: str = "epsilon"


@struct.dataclass
class LMSState:
    schedule: DiffusionSchedule
    timesteps: jnp.ndarray  # [n] float32
    sigmas: jnp.ndarray  # [n+1] float32
    lms_coeffs: jnp.ndarray  # [n, 4] float32, coeff k multiplies derivative[-1-k]
    num_inference_steps: int = struct.field(pytree_node=False, default=None)
    derivatives: Optional[jnp.ndarray] = None  # [4, *shape], newest at [-1]


def _coeff_table(sigmas: np.ndarray, n: int, order: int = LMS_ORDER) -> np.ndarray:
    """Integrated LMS coefficients (reference get_lms_coefficient, :170-190).
    Row i holds coeffs for step i, entry k multiplying the k-th newest
    derivative; unused entries are zero."""
    from scipy import integrate

    table = np.zeros((n, order), np.float32)
    for i in range(n):
        cur_order = min(i + 1, order)
        for k in range(cur_order):

            def lms_derivative(tau, k=k, cur_order=cur_order, i=i):
                prod = 1.0
                for j in range(cur_order):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[i - j]) / (sigmas[i - k] - sigmas[i - j])
                return prod

            table[i, k] = integrate.quad(lms_derivative, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]
    return table


@register_scheduler("LMSDiscreteScheduler")
class LMSDiscreteScheduler(ConfigurableScheduler):
    config_class = LMSConfig
    order = 1

    @staticmethod
    def init_noise_sigma(state: "LMSState") -> jnp.ndarray:
        return jnp.max(state.sigmas)

    def create_state(self) -> LMSState:
        schedule = DiffusionSchedule.create(self.config)
        acp = np.asarray(schedule.alphas_cumprod)
        sigmas = np.concatenate([(((1 - acp) / acp) ** 0.5)[::-1], [0.0]]).astype(np.float32)
        T = self.config.num_train_timesteps
        return LMSState(
            schedule=schedule,
            timesteps=jnp.asarray(np.linspace(0, T - 1, T, dtype=np.float32)[::-1].copy()),
            sigmas=jnp.asarray(sigmas),
            lms_coeffs=jnp.zeros((T, LMS_ORDER), jnp.float32),
            num_inference_steps=T,
        )

    def set_timesteps(self, state: LMSState, num_inference_steps: int) -> LMSState:
        T = self.config.num_train_timesteps
        acp = np.asarray(state.schedule.alphas_cumprod)
        ts, sigmas = kdiffusion_sigma_table(acp, num_inference_steps, T)
        coeffs = _coeff_table(sigmas, num_inference_steps)
        return state.replace(
            timesteps=jnp.asarray(ts.astype(np.float32)),
            sigmas=jnp.asarray(sigmas),
            lms_coeffs=jnp.asarray(coeffs),
            num_inference_steps=num_inference_steps,
        )

    def begin_sampling(self, state: LMSState, sample: jnp.ndarray) -> LMSState:
        return state.replace(derivatives=jnp.zeros((LMS_ORDER,) + sample.shape, sample.dtype))

    def scale_model_input(self, state: LMSState, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        sigma = state.sigmas[step_index]
        return sample / ((sigma**2 + 1.0) ** 0.5)

    def step(
        self,
        state: LMSState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[LMSState, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if state.derivatives is None:
            state = self.begin_sampling(state, sample)
        i = step_index
        sigma = state.sigmas[i]

        if cfg.prediction_type == "epsilon":
            pred_x0 = sample - sigma * model_output
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = model_output * (-sigma / (sigma**2 + 1.0) ** 0.5) + sample / (sigma**2 + 1.0)
        elif cfg.prediction_type == "sample":
            pred_x0 = model_output
        else:
            raise ValueError(cfg.prediction_type)

        derivative = (sample - pred_x0) / sigma
        ring = jnp.concatenate([state.derivatives[1:], derivative[None]], axis=0)

        coeffs = state.lms_coeffs[i]  # [4]; coeff k multiplies k-th newest
        prev_sample = sample
        for k in range(LMS_ORDER):
            prev_sample = prev_sample + coeffs[k] * ring[LMS_ORDER - 1 - k]

        state = state.replace(derivatives=ring)
        return state, prev_sample, pred_x0

    def add_noise(self, state: LMSState, original, noise, timesteps):
        idx = jnp.searchsorted(-state.timesteps, -timesteps.astype(state.timesteps.dtype))
        sigma = state.sigmas[idx].reshape((-1,) + (1,) * (original.ndim - 1))
        return original + noise * sigma
