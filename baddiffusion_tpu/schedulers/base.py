"""Scheduler core: β-schedules, stateless pytree states, config (de)serialization.

TPU-native re-design of the reference's scheduler stack
(`diffusers/src/diffusers/schedulers/`): every scheduler is a *pure-function*
object — static, hashable config on the Python side; all mutable quantities
(timestep tables, multistep ring buffers, step counters) live in a
`flax.struct` pytree ``State`` that threads through `lax.scan`. This is the
Flax-scheduler pattern the reference ships as prior art
(scheduling_ddpm_flax.py:26-110) pushed to the whole zoo.

Serialization keeps the HF on-disk contract (``scheduler_config.json`` with a
``_class_name`` key; reference schedulers/scheduling_utils.py:62-176) so runs
are interchangeable with the reference's checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Dict, Optional, Tuple, Type

import jax.numpy as jnp
import numpy as np
from flax import struct

SCHEDULER_CONFIG_NAME = "scheduler_config.json"


def make_betas(
    beta_schedule: str,
    beta_start: float,
    beta_end: float,
    num_train_timesteps: int,
    trained_betas=None,
    max_beta: float = 0.999,
) -> np.ndarray:
    """β-table construction matching reference scheduling_ddpm.py:140-157
    (linear / scaled_linear / squaredcos_cap_v2 / sigmoid), float32."""
    if trained_betas is not None:
        return np.asarray(trained_betas, dtype=np.float32)
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float32) ** 2
        ).astype(np.float32)
    if beta_schedule == "squaredcos_cap_v2":
        # alpha_bar(t) = cos((t + 0.008) / 1.008 * pi/2)^2  (Glide cosine schedule)
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_train_timesteps):
            t1 = i / num_train_timesteps
            t2 = (i + 1) / num_train_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
        return np.asarray(betas, dtype=np.float32)
    if beta_schedule == "sigmoid":
        betas = 1.0 / (1.0 + np.exp(-np.linspace(-6, 6, num_train_timesteps)))
        return (betas * (beta_end - beta_start) + beta_start).astype(np.float32)
    raise NotImplementedError(f"beta_schedule {beta_schedule!r} is not implemented")


@struct.dataclass
class DiffusionSchedule:
    """The shared α/β tables every discrete-time scheduler carries."""

    betas: jnp.ndarray  # [T] f32
    alphas: jnp.ndarray  # [T] f32
    alphas_cumprod: jnp.ndarray  # [T] f32

    @classmethod
    def create(cls, config) -> "DiffusionSchedule":
        betas = make_betas(
            config.beta_schedule,
            config.beta_start,
            config.beta_end,
            config.num_train_timesteps,
            getattr(config, "trained_betas", None),
        )
        alphas = (1.0 - betas).astype(np.float32)
        alphas_cumprod = np.cumprod(alphas, dtype=np.float32)
        return cls(
            betas=jnp.asarray(betas),
            alphas=jnp.asarray(alphas),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
        )


def spaced_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """'leading'-spaced descending inference timesteps, matching the reference
    DDPM/DDIM spacing (scheduling_ddpm.py:244-245): round(arange(n) * T//n)[::-1]."""
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps {num_inference_steps} > num_train_timesteps {num_train_timesteps}"
        )
    step_ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)


def multistep_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """'linspace'-spaced descending timesteps with order-preserving dedupe —
    the multistep solver family's spacing (DPM-Solver/UniPC/DEIS,
    scheduling_dpmsolver_multistep.py:197-201)."""
    ts = (
        np.linspace(0, num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    _, unique_idx = np.unique(ts, return_index=True)
    return ts[np.sort(unique_idx)].astype(np.int32)


def kdiffusion_sigma_table(alphas_cumprod: np.ndarray, num_inference_steps: int,
                           num_train_timesteps: int):
    """The k-diffusion continuous-sigma table shared by Heun and K-LMS
    (scheduling_heun_discrete.py:105-119 / scheduling_lms_discrete.py:207-221):
    float timesteps linspaced over the training range (descending) and
    sigma(t)=sqrt((1-acp)/acp) linearly interpolated onto them, 0-terminated.
    Returns (timesteps_f64_desc, sigmas_f32_with_trailing_zero)."""
    ts = np.linspace(0, num_train_timesteps - 1, num_inference_steps, dtype=float)[::-1].copy()
    sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
    sigmas = np.interp(ts, np.arange(0, len(sigmas)), sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return ts, sigmas


def add_noise_common(alphas_cumprod: jnp.ndarray, original: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0) forward marginal: √ᾱ_t·x₀ + √(1−ᾱ_t)·ε, broadcast per-sample
    (reference scheduling_ddpm.py:422-443)."""
    acp = alphas_cumprod[timesteps].astype(original.dtype)
    shape = (-1,) + (1,) * (original.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_omacp = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp * original + sqrt_omacp * noise


def get_velocity_common(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """v-prediction target: √ᾱ_t·ε − √(1−ᾱ_t)·x₀ (reference scheduling_ddpm.py:445-465)."""
    acp = alphas_cumprod[timesteps].astype(sample.dtype)
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_omacp = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp * noise - sqrt_omacp * sample


def multistep_state_init(state_cls, config):
    """The multistep solver family's common state construction (DPM-Solver /
    UniPC / DEIS all precompute the same α_t=√ᾱ, σ_t=√(1−ᾱ), λ_t=logα−logσ
    tables — reference scheduling_dpmsolver_multistep.py:141-168 et al.).
    ``state_cls`` supplies any extra fields via their defaults."""
    schedule = DiffusionSchedule.create(config)
    # derive in float64 on host, cast once: λ = ½(log ᾱ − log(1−ᾱ)) reaches
    # ~−10 under squaredcos, and the solvers' exp(λ_s−λ_t) update coefficients
    # amplify table rounding by up to ~α_s/α_t ≈ 1.6e3 on the first step —
    # f32-computed logs cost several ulps there (measured 3e-2 final-sample
    # error vs torch on squaredcos eps-mode chains; f64-derived tables are
    # ≤0.5 ulp from truth). The torch reference derives these in f32
    # (scheduling_dpmsolver_multistep.py:141-168); the residual gap is its
    # own table rounding, bounded in tests/test_scheduler_fuzz.py.
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    alpha_t = np.sqrt(acp)
    sigma_t = np.sqrt(1.0 - acp)
    lambda_t = np.log(alpha_t) - np.log(sigma_t)
    T = config.num_train_timesteps
    return state_cls(
        schedule=schedule,
        alpha_t=jnp.asarray(alpha_t, jnp.float32),
        sigma_t=jnp.asarray(sigma_t, jnp.float32),
        lambda_t=jnp.asarray(lambda_t, jnp.float32),
        timesteps=jnp.asarray(np.arange(T)[::-1].copy().astype(np.int32)),
        num_inference_steps=T,
    )


def multistep_solver_step(solver, state, model_output, step_index, sample):
    """The ring-buffer + warm-up + order-selection scaffolding shared
    verbatim by DPM-Solver and DEIS (reference
    scheduling_dpmsolver_multistep.py:507-573 / scheduling_deis_multistep.py:432-500):
    push the converted model output into the ring, pick the update order
    branchlessly (warm-up counter caps it; ``lower_order_final`` forces the
    tail), and blend the statically-computed order-k updates with
    ``jnp.where`` so the whole chain stays one `lax.scan` body.

    ``solver`` supplies ``convert_model_output`` and
    ``_first_order/_second_order/_third_order``."""
    cfg = solver.config
    if state.model_outputs is None:
        state = solver.begin_sampling(state, sample)
    n = state.timesteps.shape[0]
    i = step_index
    t = state.timesteps[i]
    prev_t = jnp.where(i == n - 1, 0, state.timesteps[jnp.clip(i + 1, 0, n - 1)])
    t_s1 = state.timesteps[jnp.clip(i - 1, 0)]
    t_s2 = state.timesteps[jnp.clip(i - 2, 0)]

    converted = solver.convert_model_output(state, model_output, t, sample)
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

    x1 = solver._first_order(state, m0, t, prev_t, sample)
    x2 = solver._second_order(state, m0, m1, t, t_s1, prev_t, sample) if cfg.solver_order >= 2 else x1
    x3 = (
        solver._third_order(state, m0, m1, m2, t, t_s1, t_s2, prev_t, sample)
        if cfg.solver_order >= 3
        else x2
    )
    prev_sample = jnp.where(use_first, x1, jnp.where(use_second_cap, x2, x3))

    state = state.replace(
        model_outputs=ring,
        lower_order_nums=jnp.minimum(lon + 1, cfg.solver_order),
    )
    return state, prev_sample, converted


def threshold_sample(sample: jnp.ndarray, ratio: float, max_value: float) -> jnp.ndarray:
    """Imagen dynamic thresholding (reference scheduling_ddpm.py:290-322);
    shared by DDPM, DDIM, and the multistep solver family."""
    batch = sample.shape[0]
    flat = jnp.abs(sample.reshape(batch, -1)).astype(jnp.float32)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value).reshape((batch,) + (1,) * (sample.ndim - 1))
    return (jnp.clip(sample, -s, s) / s).astype(sample.dtype)


def convert_multistep_model_output(cfg, output_space: str, sample, model_output, alpha_prod_t):
    """The solver family's shared model-output conversion
    (scheduling_dpmsolver_multistep.py:267-314, unipc:243-290, deis:245-276):

    - ``'x0'``: data-space prediction, dynamically thresholded when configured
      (DPM-Solver++ / UniPC predict_x0)
    - ``'epsilon'``: noise-space prediction, never thresholded (DPM-Solver /
      UniPC with predict_x0=False)
    - ``'x0_to_epsilon'``: threshold in data space, then convert back to noise
      space (DEIS — its eps is of the THRESHOLDED x0, reference deis:272-276)

    ``cfg`` needs prediction_type / thresholding / dynamic_thresholding_ratio /
    sample_max_value — the fields all three solver configs share."""
    x0, eps = pred_x0_from_model_output(cfg.prediction_type, sample, model_output, alpha_prod_t)
    if output_space == "epsilon":
        return eps
    if cfg.thresholding:
        x0 = threshold_sample(x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
    if output_space == "x0":
        return x0
    if output_space != "x0_to_epsilon":
        raise ValueError(f"unknown output_space {output_space!r}")
    return (sample - alpha_prod_t**0.5 * x0) / (1.0 - alpha_prod_t) ** 0.5


def pred_x0_from_model_output(
    prediction_type: str,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared ε-param inversion: returns (pred_original_sample, pred_epsilon)
    for 'epsilon' | 'sample' | 'v_prediction' (reference scheduling_ddim.py:319-334)."""
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a = alpha_prod_t**0.5
    sqrt_b = beta_prod_t**0.5
    if prediction_type == "epsilon":
        x0 = (sample - sqrt_b * model_output) / sqrt_a
        eps = model_output
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_b
    elif prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_b * model_output
        eps = sqrt_a * model_output + sqrt_b * sample
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    return x0, eps


# ---------------------------------------------------------------------------
# Config (de)serialization — the ConfigMixin-equivalent for schedulers.
# ---------------------------------------------------------------------------

_SCHEDULER_REGISTRY: Dict[str, Type] = {}


def register_scheduler(hf_class_name: str):
    """Class decorator: register a scheduler under its HF ``_class_name`` so
    HF-layout checkpoints round-trip (reference configuration_utils.py:142-)."""

    def wrap(cls):
        _SCHEDULER_REGISTRY[hf_class_name] = cls
        cls.hf_class_name = hf_class_name
        return cls

    return wrap


def scheduler_registry() -> Dict[str, Type]:
    return dict(_SCHEDULER_REGISTRY)


class ConfigurableScheduler:
    """Base for all schedulers: frozen-dataclass config + json round trip.

    Subclasses define a frozen ``Config`` dataclass and set ``config_class``.
    The scheduler object itself is immutable and hashable → safe as a static
    argument under ``jax.jit``.
    """

    config_class: Type = None
    hf_class_name: str = None
    order: int = 1

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class(**kwargs)
        elif kwargs:
            config = dataclasses.replace(config, **kwargs)
        self.config = self._normalize_config(config)

    def _normalize_config(self, config):
        """Subclass hook: coerce sibling-family config values / reject unknown
        ones at construction (the reference validates in ``__init__`` too —
        e.g. scheduling_unipc_multistep.py:169-173 — so a bad solver_type
        fails loud instead of silently sampling with fallback math)."""
        return config

    def __eq__(self, other):
        return type(self) is type(other) and self.config == other.config

    def __hash__(self):
        return hash((type(self).__name__, self.config))

    # -- HF-layout json round trip ------------------------------------------
    def save_config(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        payload = {"_class_name": self.hf_class_name, "_diffusers_version": "0.16.0.dev0"}
        payload.update(dataclasses.asdict(self.config))
        payload = {k: (list(v) if isinstance(v, tuple) else v) for k, v in payload.items()}
        with open(os.path.join(save_directory, SCHEDULER_CONFIG_NAME), "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)

    save_pretrained = save_config

    @classmethod
    def from_config_dict(cls, payload: Dict[str, Any]) -> "ConfigurableScheduler":
        fields = {f.name for f in dataclasses.fields(cls.config_class)}
        # JSON round-trip turns tuples into lists; convert back so loaded
        # configs stay hashable (the jit-static contract) and saved == loaded
        kwargs = {
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in payload.items()
            if k in fields
        }
        return cls(cls.config_class(**kwargs))

    @classmethod
    def from_pretrained(cls, path: str, subfolder: Optional[str] = None) -> "ConfigurableScheduler":
        if subfolder:
            path = os.path.join(path, subfolder)
        if os.path.isdir(path):
            path = os.path.join(path, SCHEDULER_CONFIG_NAME)
        with open(path) as f:
            payload = json.load(f)
        if cls is ConfigurableScheduler:
            klass = _SCHEDULER_REGISTRY.get(payload.get("_class_name"))
            if klass is None:
                raise ValueError(f"unknown scheduler class {payload.get('_class_name')!r}")
            return klass.from_config_dict(payload)
        return cls.from_config_dict(payload)


def load_scheduler(path: str, subfolder: Optional[str] = None) -> ConfigurableScheduler:
    """Load any registered scheduler from an HF-layout ``scheduler_config.json``."""
    return ConfigurableScheduler.from_pretrained(path, subfolder=subfolder)
