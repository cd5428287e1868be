"""UniPC multistep predictor-corrector as a scan-compatible stateless scheduler.

Behavioral contract: reference `schedulers/scheduling_unipc_multistep.py:57-`:
UniP B(h) predictor (:308-410) and UniC B(h) corrector (:412-515) with
bh1/bh2 variants, order warm-up + lower_order_final (:560-585), corrector
applied from the second step using the PREVIOUS step's order (:555-566),
linspace timestep spacing shared with DPM-Solver.

Scan design: rings for model outputs and their timesteps, ``last_sample`` and
``this_order`` carried in the state; order-k updates computed for every static
k ≤ solver_order and `jnp.where`-selected (the k×k linear solves are ≤3×3 —
trivial next to the UNet forward).
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
class UniPCConfig:
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
    predict_x0: bool = True
    solver_type: str = "bh2"
    lower_order_final: bool = True
    disable_corrector: tuple = ()


@struct.dataclass
class UniPCState:
    schedule: DiffusionSchedule
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lambda_t: jnp.ndarray
    timesteps: jnp.ndarray
    num_inference_steps: int = struct.field(pytree_node=False, default=None)
    model_outputs: Optional[jnp.ndarray] = None  # [order, *shape]
    timestep_ring: Optional[jnp.ndarray] = None  # [order] int32
    lower_order_nums: Optional[jnp.ndarray] = None
    last_sample: Optional[jnp.ndarray] = None
    this_order: Optional[jnp.ndarray] = None  # order chosen at the previous step


@register_scheduler("UniPCMultistepScheduler")
class UniPCMultistepScheduler(ConfigurableScheduler):
    config_class = UniPCConfig
    init_noise_sigma = 1.0
    order = 1

    def _normalize_config(self, config):
        # reference coercion (scheduling_unipc_multistep.py:169-173): sibling
        # solver families map to bh1, anything else is rejected loudly
        if config.solver_type not in ("bh1", "bh2"):
            if config.solver_type in ("midpoint", "heun", "logrho"):
                return dataclasses.replace(config, solver_type="bh1")
            raise NotImplementedError(
                f"solver_type {config.solver_type!r} is not implemented for UniPCMultistepScheduler"
            )
        return config

    def create_state(self) -> UniPCState:
        return multistep_state_init(UniPCState, self.config)

    def set_timesteps(self, state: UniPCState, num_inference_steps: int) -> UniPCState:
        T = self.config.num_train_timesteps
        ts = multistep_timesteps(T, num_inference_steps)
        return state.replace(timesteps=jnp.asarray(ts), num_inference_steps=len(ts))

    def begin_sampling(self, state: UniPCState, sample: jnp.ndarray) -> UniPCState:
        order = self.config.solver_order
        return state.replace(
            model_outputs=jnp.zeros((order,) + sample.shape, sample.dtype),
            timestep_ring=jnp.zeros((order,), jnp.int32),
            lower_order_nums=jnp.zeros((), jnp.int32),
            last_sample=jnp.zeros_like(sample),
            this_order=jnp.ones((), jnp.int32),
        )

    def scale_model_input(self, state, sample, step_index=None):
        return sample

    def convert_model_output(self, state: UniPCState, model_output, t, sample):
        cfg = self.config
        space = "x0" if cfg.predict_x0 else "epsilon"
        return convert_multistep_model_output(
            cfg, space, sample, model_output, state.schedule.alphas_cumprod[t]
        )

    def _coeffs(self, state: UniPCState, ring_t, t_target, order: int):
        """Shared R/b/B_h machinery of UniP and UniC for static ``order``."""
        cfg = self.config
        s0 = ring_t[-1]
        lam_t, lam_s0 = state.lambda_t[t_target], state.lambda_t[s0]
        h = lam_t - lam_s0
        rks = []
        for i in range(1, order):
            si = ring_t[-(i + 1)]
            rks.append((state.lambda_t[si] - lam_s0) / h)
        rks.append(jnp.asarray(1.0, jnp.float32))
        rks = jnp.stack(rks)  # [order]

        hh = -h if cfg.predict_x0 else h
        h_phi_1 = jnp.expm1(hh)
        B_h = hh if cfg.solver_type == "bh1" else jnp.expm1(hh)

        R_rows, b_vals = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        factorial_i = 1.0
        for i in range(1, order + 1):
            R_rows.append(jnp.power(rks, i - 1))
            b_vals.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        R = jnp.stack(R_rows)  # [order, order]
        b = jnp.stack(b_vals)  # [order]
        return h, h_phi_1, B_h, R, b

    def _d1s(self, state: UniPCState, ring_m, ring_t, t_target, order: int):
        s0 = ring_t[-1]
        m0 = ring_m[-1]
        lam_s0 = state.lambda_t[s0]
        h = state.lambda_t[t_target] - lam_s0
        d1s = []
        for i in range(1, order):
            si = ring_t[-(i + 1)]
            mi = ring_m[-(i + 1)]
            rk = (state.lambda_t[si] - lam_s0) / h
            d1s.append((mi - m0) / rk)
        return d1s  # list of [*shape], length order-1

    def _uni_p(self, state, ring_m, ring_t, t_target, x, order: int):
        """UniP B(h) predictor for static order (reference :308-410)."""
        cfg = self.config
        s0 = ring_t[-1]
        m0 = ring_m[-1]
        _h, h_phi_1, B_h, R, b = self._coeffs(state, ring_t, t_target, order)
        d1s = self._d1s(state, ring_m, ring_t, t_target, order)

        if order == 1:
            rhos_p = None
        elif order == 2:
            rhos_p = jnp.asarray([0.5], jnp.float32)
        else:
            rhos_p = self._solve_small(R[:-1, :-1], b[:-1])

        if cfg.predict_x0:
            a_t, s_t, s_s0 = state.alpha_t[t_target], state.sigma_t[t_target], state.sigma_t[s0]
            x_t_ = s_t / s_s0 * x - a_t * h_phi_1 * m0
            res = 0.0
            if rhos_p is not None:
                res = sum(rhos_p[k] * d1s[k] for k in range(order - 1))
            return x_t_ - a_t * B_h * res
        a_t, a_s0, s_t = state.alpha_t[t_target], state.alpha_t[s0], state.sigma_t[t_target]
        x_t_ = a_t / a_s0 * x - s_t * h_phi_1 * m0
        res = 0.0
        if rhos_p is not None:
            res = sum(rhos_p[k] * d1s[k] for k in range(order - 1))
        return x_t_ - s_t * B_h * res

    def _uni_c(self, state, ring_m, ring_t, model_t, t_target, last_x, order: int):
        """UniC B(h) corrector for static order (reference :412-515).

        ring here is the PREVIOUS step's ring (m0 = previous model output).
        """
        cfg = self.config
        s0 = ring_t[-1]
        m0 = ring_m[-1]
        _h, h_phi_1, B_h, R, b = self._coeffs(state, ring_t, t_target, order)
        d1s = self._d1s(state, ring_m, ring_t, t_target, order)

        if order == 1:
            rhos_c = jnp.asarray([0.5], jnp.float32)
        else:
            rhos_c = self._solve_small(R, b)

        corr = 0.0
        for k in range(order - 1):
            corr = corr + rhos_c[k] * d1s[k]
        D1_t = model_t - m0
        if cfg.predict_x0:
            a_t, s_t, s_s0 = state.alpha_t[t_target], state.sigma_t[t_target], state.sigma_t[s0]
            x_t_ = s_t / s_s0 * last_x - a_t * h_phi_1 * m0
            return x_t_ - a_t * B_h * (corr + rhos_c[order - 1] * D1_t)
        a_t, a_s0, s_t = state.alpha_t[t_target], state.alpha_t[s0], state.sigma_t[t_target]
        x_t_ = a_t / a_s0 * last_x - s_t * h_phi_1 * m0
        return x_t_ - s_t * B_h * (corr + rhos_c[order - 1] * D1_t)

    @staticmethod
    def _solve_small(R: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Closed-form solve for the static n<=3 UniPC systems.

        ``jnp.linalg.solve`` on these tiny systems lowers to the general LU
        pipeline, which inside the 50-step sampling scan ballooned the TPU
        chain compile from ~80 s to ~23 min (SWEEP.json r4 UNIPC-SCHED
        measure_wall anomaly). Cramer's rule on a 2x2/3x3 f32 system is exact
        to ulp-level of the same arithmetic and compiles to a handful of
        fused multiplies."""
        n = R.shape[0]
        if n == 1:
            return b / R[0]
        if n == 2:
            det = R[0, 0] * R[1, 1] - R[0, 1] * R[1, 0]
            x0 = (b[0] * R[1, 1] - R[0, 1] * b[1]) / det
            x1 = (R[0, 0] * b[1] - b[0] * R[1, 0]) / det
            return jnp.stack([x0, x1])
        if n == 3:
            def det3(m):
                return (
                    m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
                    - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
                    + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0])
                )

            det = det3(R)
            cols = []
            for j in range(3):
                Rj = R.at[:, j].set(b)
                cols.append(det3(Rj) / det)
            return jnp.stack(cols)
        return jnp.linalg.solve(R, b)  # unreachable for solver_order <= 3

    @staticmethod
    def _select_order(candidates, this_order):
        out = candidates[0]
        for k in range(1, len(candidates)):
            out = jnp.where(this_order == k + 1, candidates[k], out)
        return out

    def step(
        self,
        state: UniPCState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[UniPCState, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if state.model_outputs is None:
            state = self.begin_sampling(state, sample)
        n = state.timesteps.shape[0]
        i = step_index
        t = state.timesteps[i]
        prev_t = jnp.where(i == n - 1, 0, state.timesteps[jnp.clip(i + 1, 0, n - 1)])

        converted = self.convert_model_output(state, model_output, t, sample)

        # corrector uses the PREVIOUS ring and last step's order (:555-566)
        use_corr = i > 0
        if cfg.disable_corrector:
            for d in cfg.disable_corrector:
                use_corr = use_corr & (i - 1 != d)
        corr_candidates = [
            self._uni_c(state, state.model_outputs, state.timestep_ring, converted, t, state.last_sample, k)
            for k in range(1, cfg.solver_order + 1)
        ]
        corrected = self._select_order(corr_candidates, state.this_order)
        sample = jnp.where(use_corr, corrected, sample)

        # push rings
        ring_m = jnp.concatenate([state.model_outputs[1:], converted[None]], axis=0)
        ring_t = jnp.concatenate([state.timestep_ring[1:], t[None].astype(jnp.int32)], axis=0)

        # order schedule (:560-566)
        if cfg.lower_order_final:
            this_order = jnp.minimum(cfg.solver_order, n - i)
        else:
            this_order = jnp.asarray(cfg.solver_order)
        this_order = jnp.minimum(this_order, state.lower_order_nums + 1).astype(jnp.int32)

        pred_candidates = [
            self._uni_p(state, ring_m, ring_t, prev_t, sample, k)
            for k in range(1, cfg.solver_order + 1)
        ]
        prev_sample = self._select_order(pred_candidates, this_order)

        state = state.replace(
            model_outputs=ring_m,
            timestep_ring=ring_t,
            lower_order_nums=jnp.minimum(state.lower_order_nums + 1, cfg.solver_order),
            last_sample=sample,
            this_order=this_order,
        )
        return state, prev_sample, converted

    def add_noise(self, state: UniPCState, original, noise, timesteps):
        return add_noise_common(state.schedule.alphas_cumprod, original, noise, timesteps)
