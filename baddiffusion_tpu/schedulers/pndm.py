"""PNDM (PRK warm-up + PLMS linear multistep) as a scan-compatible scheduler.

Behavioral contract: reference `schedulers/scheduling_pndm.py:57-`:
timestep construction with PRK doubling (:151-190), the counter state machine
dispatching step_prk (:223-276) vs step_plms (:278-352), the 1/2/3/4th-order
PLMS combinations (:330-340), and `_get_prev_sample` formula (9) of
arXiv 2202.09778 (:369-410). Both skip_prk_steps modes are supported.

Scan design: the reference's ``counter`` IS the scan index; ets is a length-4
ring; cur_model_output / cur_sample carry the RK accumulation. All mode
selection is `jnp.where` on the traced index.
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
)


@dataclasses.dataclass(frozen=True)
class PNDMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    trained_betas: Optional[tuple] = None
    skip_prk_steps: bool = False
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"
    steps_offset: int = 0


@struct.dataclass
class PNDMState:
    schedule: DiffusionSchedule
    timesteps: jnp.ndarray  # [prk + plms] int32
    num_inference_steps: int = struct.field(pytree_node=False, default=None)
    prk_len: int = struct.field(pytree_node=False, default=0)
    ets: Optional[jnp.ndarray] = None  # [4, *shape]
    ets_len: Optional[jnp.ndarray] = None
    cur_model_output: Optional[jnp.ndarray] = None
    cur_sample: Optional[jnp.ndarray] = None


PNDM_ORDER = 4


@register_scheduler("PNDMScheduler")
class PNDMScheduler(ConfigurableScheduler):
    config_class = PNDMConfig
    init_noise_sigma = 1.0
    order = 1

    def create_state(self) -> PNDMState:
        T = self.config.num_train_timesteps
        return PNDMState(
            schedule=DiffusionSchedule.create(self.config),
            timesteps=jnp.asarray(np.arange(T)[::-1].copy().astype(np.int32)),
            num_inference_steps=T,
            prk_len=0,
        )

    def set_timesteps(self, state: PNDMState, num_inference_steps: int) -> PNDMState:
        cfg = self.config
        T = cfg.num_train_timesteps
        step_ratio = T // num_inference_steps
        _ts = (np.arange(0, num_inference_steps) * step_ratio).round()
        _ts = _ts + cfg.steps_offset
        if cfg.skip_prk_steps:
            prk = np.array([])
            plms = np.concatenate([_ts[:-1], _ts[-2:-1], _ts[-1:]])[::-1].copy()
        else:
            prk_ts = np.array(_ts[-PNDM_ORDER:]).repeat(2) + np.tile(
                np.array([0, T // num_inference_steps // 2]), PNDM_ORDER
            )
            prk = (prk_ts[:-1].repeat(2)[1:-1])[::-1].copy()
            plms = _ts[:-3][::-1].copy()
        ts = np.concatenate([prk, plms]).astype(np.int32)
        if ts.size and ts.max() >= T:
            # loud failure mirroring the torch reference's IndexError; JAX
            # clamps OOB gathers silently (see ddim.set_timesteps)
            raise ValueError(
                f"steps_offset={cfg.steps_offset} pushes timestep {int(ts.max())} past "
                f"num_train_timesteps={T}; lower num_inference_steps or steps_offset"
            )
        return state.replace(
            timesteps=jnp.asarray(ts),
            num_inference_steps=num_inference_steps,
            prk_len=len(prk),
        )

    def begin_sampling(self, state: PNDMState, sample: jnp.ndarray) -> PNDMState:
        return state.replace(
            ets=jnp.zeros((PNDM_ORDER,) + sample.shape, sample.dtype),
            ets_len=jnp.zeros((), jnp.int32),
            cur_model_output=jnp.zeros_like(sample),
            cur_sample=jnp.zeros_like(sample),
        )

    def scale_model_input(self, state, sample, step_index=None):
        return sample

    def _final_alpha_cumprod(self, state):
        if self.config.set_alpha_to_one:
            return jnp.asarray(1.0, state.schedule.alphas_cumprod.dtype)
        return state.schedule.alphas_cumprod[0]

    def _get_prev_sample(self, state, sample, t, prev_t, model_output):
        acp = state.schedule.alphas_cumprod
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], self._final_alpha_cumprod(state))
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev

        if self.config.prediction_type == "v_prediction":
            model_output = (alpha_prod_t**0.5) * model_output + (beta_prod_t**0.5) * sample
        elif self.config.prediction_type != "epsilon":
            raise ValueError(self.config.prediction_type)

        sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
        denom = alpha_prod_t * beta_prod_t_prev**0.5 + (alpha_prod_t * beta_prod_t * alpha_prod_t_prev) ** 0.5
        return sample_coeff * sample - (alpha_prod_t_prev - alpha_prod_t) * model_output / denom

    def step(
        self,
        state: PNDMState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[PNDMState, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if state.ets is None:
            state = self.begin_sampling(state, sample)
        n_total = state.timesteps.shape[0]
        T_ratio = cfg.num_train_timesteps // state.num_inference_steps
        i = step_index
        t_in = state.timesteps[i]
        m = model_output

        def bselect(flag, a, b):
            return jnp.where(flag, a, b)

        # ---- PRK branch quantities (reference :223-276) ----------------------
        in_prk = (i < state.prk_len) if state.prk_len > 0 else jnp.asarray(False)
        r = jnp.mod(i, 4)
        prk_diff = jnp.where(jnp.mod(i, 2) == 0, T_ratio // 2, 0)
        prk_prev_t = t_in - prk_diff
        prk_t_used = state.timesteps[jnp.clip((i // 4) * 4, 0, n_total - 1)]

        prk_cur_out = state.cur_model_output
        prk_new_cur = jnp.where(
            r == 0, prk_cur_out + m / 6.0,
            jnp.where(r == 3, jnp.zeros_like(m), prk_cur_out + m / 3.0),
        )
        prk_model_used = jnp.where(r == 3, prk_cur_out + m / 6.0, m)
        prk_cur_sample = jnp.where(r == 0, sample, state.cur_sample)
        prk_prev_sample = self._get_prev_sample(state, prk_cur_sample, prk_t_used, prk_prev_t, prk_model_used)

        # ---- PLMS branch quantities (reference :278-352) ----------------------
        is_skip_special = jnp.asarray(cfg.skip_prk_steps) & (i == 1)
        plms_prev_t = jnp.where(is_skip_special, t_in, t_in - T_ratio)
        plms_t_used = jnp.where(is_skip_special, t_in + T_ratio, t_in)

        push_plms = ~is_skip_special
        new_len_plms = jnp.minimum(state.ets_len + push_plms.astype(jnp.int32), PNDM_ORDER)
        ets_pushed = jnp.concatenate([state.ets[1:], m[None]], axis=0)
        ets_plms = jnp.where(push_plms, ets_pushed, state.ets)

        e1, e2, e3, e4 = ets_plms[-1], ets_plms[-2], ets_plms[-3], ets_plms[-4]
        plms_model = jnp.where(
            new_len_plms == 1,
            jnp.where(is_skip_special, (m + e1) / 2.0, m),
            jnp.where(
                new_len_plms == 2,
                (3.0 * e1 - e2) / 2.0,
                jnp.where(
                    new_len_plms == 3,
                    (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0,
                    (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0,
                ),
            ),
        )
        plms_sample_used = jnp.where(is_skip_special, state.cur_sample, sample)
        plms_cur_sample = jnp.where((new_len_plms == 1) & (i == 0), sample, state.cur_sample)
        plms_prev_sample = self._get_prev_sample(state, plms_sample_used, plms_t_used, plms_prev_t, plms_model)

        # ---- merge branches ---------------------------------------------------
        prev_sample = bselect(in_prk, prk_prev_sample, plms_prev_sample)
        push_prk = in_prk & (r == 0)
        new_ets = jnp.where(push_prk | (~in_prk & push_plms), ets_pushed, state.ets)
        new_len = jnp.where(
            push_prk | (~in_prk & push_plms),
            jnp.minimum(state.ets_len + 1, PNDM_ORDER),
            state.ets_len,
        )
        new_cur_out = bselect(in_prk, prk_new_cur, state.cur_model_output)
        new_cur_sample = bselect(in_prk, prk_cur_sample, plms_cur_sample)

        state = state.replace(
            ets=new_ets,
            ets_len=new_len,
            cur_model_output=new_cur_out,
            cur_sample=new_cur_sample,
        )
        return state, prev_sample, m

    def add_noise(self, state: PNDMState, original, noise, timesteps):
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)
