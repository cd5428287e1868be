"""DEIS (log-rho multistep) as a scan-compatible stateless scheduler.

Behavioral contract: reference `schedulers/scheduling_deis_multistep.py:58-`:
model output converted to x₀ then back to DEIS-space ε (:246-276), first-order
update ≡ DDIM (:278-305), second/third-order log-rho polynomial integration
coefficients (:307-430), warm-up + lower_order_final ordering identical to
DPM-Solver (:432-500). Same scan design as dpmsolver.py.
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
    register_scheduler,
    multistep_timesteps,
)


@dataclasses.dataclass(frozen=True)
class DEISConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    solver_order: int = 2
    prediction_type: str = "epsilon"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    algorithm_type: str = "deis"
    solver_type: str = "logrho"
    lower_order_final: bool = True


@struct.dataclass
class DEISState:
    schedule: DiffusionSchedule
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lambda_t: jnp.ndarray
    timesteps: jnp.ndarray
    num_inference_steps: int = struct.field(pytree_node=False, default=None)
    model_outputs: Optional[jnp.ndarray] = None
    lower_order_nums: Optional[jnp.ndarray] = None


@register_scheduler("DEISMultistepScheduler")
class DEISMultistepScheduler(ConfigurableScheduler):
    config_class = DEISConfig
    init_noise_sigma = 1.0
    order = 1

    def create_state(self) -> DEISState:
        schedule = DiffusionSchedule.create(self.config)
        acp = schedule.alphas_cumprod
        alpha_t = jnp.sqrt(acp)
        sigma_t = jnp.sqrt(1.0 - acp)
        T = self.config.num_train_timesteps
        return DEISState(
            schedule=schedule,
            alpha_t=alpha_t,
            sigma_t=sigma_t,
            lambda_t=jnp.log(alpha_t) - jnp.log(sigma_t),
            timesteps=jnp.asarray(np.arange(T)[::-1].copy().astype(np.int32)),
            num_inference_steps=T,
        )

    def set_timesteps(self, state: DEISState, num_inference_steps: int) -> DEISState:
        T = self.config.num_train_timesteps
        ts = multistep_timesteps(T, num_inference_steps)
        return state.replace(timesteps=jnp.asarray(ts), num_inference_steps=len(ts))

    def begin_sampling(self, state: DEISState, sample: jnp.ndarray) -> DEISState:
        return state.replace(
            model_outputs=jnp.zeros((self.config.solver_order,) + sample.shape, sample.dtype),
            lower_order_nums=jnp.zeros((), jnp.int32),
        )

    def scale_model_input(self, state, sample, step_index=None):
        return sample

    def convert_model_output(self, state: DEISState, model_output, t, sample):
        cfg = self.config
        alpha_t, sigma_t = state.alpha_t[t], state.sigma_t[t]
        if cfg.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif cfg.prediction_type == "sample":
            x0 = model_output
        elif cfg.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        else:
            raise ValueError(cfg.prediction_type)
        if cfg.thresholding:
            from baddiffusion_tpu.schedulers.ddpm import _threshold_sample

            x0 = _threshold_sample(x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
        # DEIS-space epsilon (reference :272-276)
        return (sample - alpha_t * x0) / sigma_t

    def _first_order(self, state, m0, t, prev_t, sample):
        lam_t, lam_s = state.lambda_t[prev_t], state.lambda_t[t]
        a_t, a_s = state.alpha_t[prev_t], state.alpha_t[t]
        s_t = state.sigma_t[prev_t]
        h = lam_t - lam_s
        return (a_t / a_s) * sample - (s_t * (jnp.exp(h) - 1.0)) * m0

    def _second_order(self, state, m0, m1, t_s0, t_s1, prev_t, sample):
        a_t, a_s0, a_s1 = state.alpha_t[prev_t], state.alpha_t[t_s0], state.alpha_t[t_s1]
        s_t, s_s0, s_s1 = state.sigma_t[prev_t], state.sigma_t[t_s0], state.sigma_t[t_s1]
        rho_t, rho_s0, rho_s1 = s_t / a_t, s_s0 / a_s0, s_s1 / a_s1

        def ind_fn(t, b, c):
            return t * (-jnp.log(c) + jnp.log(t) - 1.0) / (jnp.log(b) - jnp.log(c))

        coef1 = ind_fn(rho_t, rho_s0, rho_s1) - ind_fn(rho_s0, rho_s0, rho_s1)
        coef2 = ind_fn(rho_t, rho_s1, rho_s0) - ind_fn(rho_s0, rho_s1, rho_s0)
        return a_t * (sample / a_s0 + coef1 * m0 + coef2 * m1)

    def _third_order(self, state, m0, m1, m2, t_s0, t_s1, t_s2, prev_t, sample):
        a_t = state.alpha_t[prev_t]
        a_s0, a_s1, a_s2 = state.alpha_t[t_s0], state.alpha_t[t_s1], state.alpha_t[t_s2]
        s_t = state.sigma_t[prev_t]
        s_s0, s_s1, s_s2 = state.sigma_t[t_s0], state.sigma_t[t_s1], state.sigma_t[t_s2]
        rho_t, rho_s0, rho_s1, rho_s2 = s_t / a_t, s_s0 / a_s0, s_s1 / a_s1, s_s2 / a_s2

        def ind_fn(t, b, c, d):
            numerator = t * (
                jnp.log(c) * (jnp.log(d) - jnp.log(t) + 1.0)
                - jnp.log(d) * jnp.log(t)
                + jnp.log(d)
                + jnp.log(t) ** 2
                - 2.0 * jnp.log(t)
                + 2.0
            )
            denominator = (jnp.log(b) - jnp.log(c)) * (jnp.log(b) - jnp.log(d))
            return numerator / denominator

        coef1 = ind_fn(rho_t, rho_s0, rho_s1, rho_s2) - ind_fn(rho_s0, rho_s0, rho_s1, rho_s2)
        coef2 = ind_fn(rho_t, rho_s1, rho_s2, rho_s0) - ind_fn(rho_s0, rho_s1, rho_s2, rho_s0)
        coef3 = ind_fn(rho_t, rho_s2, rho_s0, rho_s1) - ind_fn(rho_s0, rho_s2, rho_s0, rho_s1)
        return a_t * (sample / a_s0 + coef1 * m0 + coef2 * m1 + coef3 * m2)

    def step(
        self,
        state: DEISState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[DEISState, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if state.model_outputs is None:
            state = self.begin_sampling(state, sample)
        n = state.timesteps.shape[0]
        i = step_index
        t = state.timesteps[i]
        prev_t = jnp.where(i == n - 1, 0, state.timesteps[jnp.clip(i + 1, 0, n - 1)])
        t_s1 = state.timesteps[jnp.clip(i - 1, 0)]
        t_s2 = state.timesteps[jnp.clip(i - 2, 0)]

        converted = self.convert_model_output(state, model_output, t, sample)
        ring = jnp.concatenate([state.model_outputs[1:], converted[None]], axis=0)
        m0 = ring[-1]
        m1 = ring[-2] if cfg.solver_order >= 2 else ring[-1]
        m2 = ring[-3] if cfg.solver_order >= 3 else ring[-1]

        lon = state.lower_order_nums
        lof = cfg.lower_order_final and n < 15
        use_first = (cfg.solver_order == 1) | (lon < 1)
        use_second_cap = (cfg.solver_order == 2) | (lon < 2)
        if lof:
            use_first = use_first | (i == n - 1)
            use_second_cap = use_second_cap | (i == n - 2)

        x1 = self._first_order(state, m0, t, prev_t, sample)
        x2 = self._second_order(state, m0, m1, t, t_s1, prev_t, sample) if cfg.solver_order >= 2 else x1
        x3 = (
            self._third_order(state, m0, m1, m2, t, t_s1, t_s2, prev_t, sample)
            if cfg.solver_order >= 3
            else x2
        )
        prev_sample = jnp.where(use_first, x1, jnp.where(use_second_cap, x2, x3))

        state = state.replace(
            model_outputs=ring,
            lower_order_nums=jnp.minimum(lon + 1, cfg.solver_order),
        )
        return state, prev_sample, converted

    def add_noise(self, state: DEISState, original, noise, timesteps):
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)
