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
    convert_multistep_model_output,
    multistep_solver_step,
    multistep_state_init,
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

    def _normalize_config(self, config):
        # reference coercion (scheduling_deis_multistep.py:154-165)
        if config.algorithm_type != "deis":
            if config.algorithm_type in ("dpmsolver", "dpmsolver++"):
                config = dataclasses.replace(config, algorithm_type="deis")
            else:
                raise NotImplementedError(
                    f"algorithm_type {config.algorithm_type!r} is not implemented for DEISMultistepScheduler"
                )
        if config.solver_type != "logrho":
            if config.solver_type in ("midpoint", "heun", "bh1", "bh2"):
                config = dataclasses.replace(config, solver_type="logrho")
            else:
                raise NotImplementedError(
                    f"solver_type {config.solver_type!r} is not implemented for DEISMultistepScheduler"
                )
        return config

    def create_state(self) -> DEISState:
        return multistep_state_init(DEISState, self.config)

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
        # DEIS-space epsilon of the (thresholded) x0 (reference :272-276)
        return convert_multistep_model_output(
            self.config, "x0_to_epsilon", sample, model_output, state.schedule.alphas_cumprod[t]
        )

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
        # warm-up/ring/order scaffolding shared with DPM-Solver (base.py)
        return multistep_solver_step(self, state, model_output, step_index, sample)

    def add_noise(self, state: DEISState, original, noise, timesteps):
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)
