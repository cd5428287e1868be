"""Score-SDE VE (variance-exploding) predictor-corrector scheduler.

Behavioral contract: reference `schedulers/scheduling_sde_ve.py:46-290`:
continuous timesteps linspace(1, eps, n) (:105-119), geometric sigma tables
(:121-148), reverse-SDE predictor step_pred (:156-217) and Langevin corrector
step_correct with SNR-scaled step size (:219-269). The driving loop lives in
`pipelines/sampler.py::sample_sde_ve` (the model is fed σ_t, not t — reference
pipeline_score_sde_ve.py:85-113).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from baddiffusion_tpu.schedulers.base import ConfigurableScheduler, register_scheduler


@dataclasses.dataclass(frozen=True)
class ScoreSdeVeConfig:
    num_train_timesteps: int = 2000
    snr: float = 0.15
    sigma_min: float = 0.01
    sigma_max: float = 1348.0
    sampling_eps: float = 1e-5
    correct_steps: int = 1


@struct.dataclass
class ScoreSdeVeState:
    timesteps: jnp.ndarray  # [n] f32, linspace(1, eps, n)
    sigmas: jnp.ndarray  # [n]
    discrete_sigmas: jnp.ndarray  # [n]
    num_inference_steps: int = struct.field(pytree_node=False, default=None)


@register_scheduler("ScoreSdeVeScheduler")
class ScoreSdeVeScheduler(ConfigurableScheduler):
    config_class = ScoreSdeVeConfig
    order = 1

    @property
    def init_noise_sigma(self):
        return self.config.sigma_max

    def create_state(self) -> ScoreSdeVeState:
        return self.set_timesteps(None, self.config.num_train_timesteps)

    def set_timesteps(self, state: Optional[ScoreSdeVeState], num_inference_steps: int, sampling_eps: Optional[float] = None) -> ScoreSdeVeState:
        cfg = self.config
        eps = sampling_eps if sampling_eps is not None else cfg.sampling_eps
        ts = np.linspace(1.0, eps, num_inference_steps, dtype=np.float32)
        # note: exponent is t itself — the reference's final assignment
        # (scheduling_sde_ve.py:148) supersedes the earlier t/eps variant
        sigmas = cfg.sigma_min * (cfg.sigma_max / cfg.sigma_min) ** ts
        discrete = np.exp(np.linspace(math.log(cfg.sigma_min), math.log(cfg.sigma_max), num_inference_steps))
        return ScoreSdeVeState(
            timesteps=jnp.asarray(ts),
            sigmas=jnp.asarray(sigmas.astype(np.float32)),
            discrete_sigmas=jnp.asarray(discrete.astype(np.float32)),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, step_index=None):
        return sample

    def step_pred(
        self,
        state: ScoreSdeVeState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[ScoreSdeVeState, jnp.ndarray, jnp.ndarray]:
        """Reverse-SDE predictor (reference :156-217). Returns
        (state, prev_sample, prev_sample_mean)."""
        n = state.timesteps.shape[0]
        t = state.timesteps[step_index]
        ts_idx = (t * (n - 1)).astype(jnp.int32)
        sigma = state.discrete_sigmas[ts_idx]
        adjacent = jnp.where(ts_idx == 0, 0.0, state.discrete_sigmas[jnp.clip(ts_idx - 1, 0)])
        diffusion = (sigma**2 - adjacent**2) ** 0.5
        drift = -(diffusion**2) * model_output
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        prev_sample_mean = sample - drift
        prev_sample = prev_sample_mean + diffusion * noise
        return state, prev_sample, prev_sample_mean

    def step_correct(
        self,
        state: ScoreSdeVeState,
        model_output: jnp.ndarray,
        sample: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """Langevin corrector (reference :219-269)."""
        cfg = self.config
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        grad_norm = jnp.mean(jnp.linalg.norm(model_output.reshape(model_output.shape[0], -1), axis=-1))
        noise_norm = jnp.mean(jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
        step_size = (cfg.snr * noise_norm / grad_norm) ** 2 * 2.0
        prev_sample_mean = sample + step_size * model_output
        return prev_sample_mean + ((step_size * 2.0) ** 0.5) * noise

    def add_noise(self, state: ScoreSdeVeState, original, noise, timesteps):
        sigmas = state.discrete_sigmas[timesteps].reshape((-1,) + (1,) * (original.ndim - 1))
        return original + noise * sigmas
