"""Model/scheduler/pipeline factory — the reference `DiffuserModelSched`
surface (model.py:531-729) rebuilt for flax.

- checkpoint aliases map to HF hub ids (model.py:700-711); unknown aliases
  fall through as filesystem paths (offline-first: no network egress here, so
  hub ids resolve only via the local HF cache).
- 13 scheduler names dispatch with T=1000, β 1e-4→0.02 linear
  (model.py:586-637); solver families run through the generic per-step-clip
  pipeline wrapper (the reference's modified PNDMPipeline, SURVEY.md §2.2).
- scratch model = the reference's default UNet2DModel architecture
  (model.py:657-679).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from baddiffusion_tpu.models.unet2d import DEFAULT_SCRATCH_CONFIG, UNet2DModel
from baddiffusion_tpu.pipelines.pipeline import DiffusionPipeline


class DiffuserModelSched:
    CLIP_SAMPLE_DEFAULT = False
    MODEL_DEFAULT = "DEFAULT"
    DDPM_CIFAR10_DEFAULT = "DDPM-CIFAR10-DEFAULT"
    DDPM_CELEBA_HQ_DEFAULT = "DDPM-CELEBA-HQ-DEFAULT"
    DDPM_CHURCH_DEFAULT = "DDPM-CHURCH-DEFAULT"
    DDPM_BEDROOM_DEFAULT = "DDPM-BEDROOM-DEFAULT"
    LDM_CELEBA_HQ_DEFAULT = "LDM-CELEBA-HQ-DEFAULT"

    DDPM_CIFAR10_32 = "DDPM-CIFAR10-32"
    DDPM_CELEBA_HQ_256 = "DDPM-CELEBA-HQ-256"
    DDPM_CHURCH_256 = "DDPM-CHURCH-256"
    DDPM_BEDROOM_256 = "DDPM-BEDROOM-256"
    LDM_CELEBA_HQ_256 = "LDM-CELEBA-HQ-256"

    DDPM_SCHED = "DDPM-SCHED"
    DDIM_SCHED = "DDIM-SCHED"
    DPM_SOLVER_PP_O1_SCHED = "DPM_SOLVER_PP_O1-SCHED"
    DPM_SOLVER_O1_SCHED = "DPM_SOLVER_O1-SCHED"
    DPM_SOLVER_PP_O2_SCHED = "DPM_SOLVER_PP_O2-SCHED"
    DPM_SOLVER_O2_SCHED = "DPM_SOLVER_O2-SCHED"
    DPM_SOLVER_PP_O3_SCHED = "DPM_SOLVER_PP_O3-SCHED"
    DPM_SOLVER_O3_SCHED = "DPM_SOLVER_O3-SCHED"
    UNIPC_SCHED = "UNIPC-SCHED"
    PNDM_SCHED = "PNDM-SCHED"
    DEIS_SCHED = "DEIS-SCHED"
    HEUN_SCHED = "HEUN-SCHED"
    LMSD_SCHED = "LMSD-SCHED"
    LDM_SCHED = "LDM-SCHED"
    SCORE_SDE_VE_SCHED = "SCORE-SDE-VE-SCHED"


HUB_ALIASES = {
    DiffuserModelSched.DDPM_CIFAR10_32: "google/ddpm-cifar10-32",
    DiffuserModelSched.DDPM_CELEBA_HQ_256: "google/ddpm-ema-celebahq-256",
    DiffuserModelSched.DDPM_CHURCH_256: "google/ddpm-ema-church-256",
    DiffuserModelSched.DDPM_BEDROOM_256: "google/ddpm-ema-bedroom-256",
    DiffuserModelSched.LDM_CELEBA_HQ_256: "CompVis/ldm-celebahq-256",
}

T, BETA_START, BETA_END = 1000, 0.0001, 0.02


def _sched_spec(name: str):
    """name -> (scheduler_ctor_kwargs_fn, pipeline_kind). Imports are lazy so
    each solver lands independently."""
    from baddiffusion_tpu import schedulers as S

    common = dict(num_train_timesteps=T, beta_start=BETA_START, beta_end=BETA_END)

    def ddpm(clip):
        return S.DDPMScheduler(S.DDPMConfig(clip_sample=clip, **common))

    def ddim(clip):
        return S.DDIMScheduler(S.DDIMConfig(clip_sample=clip, **common))

    def dpm(order, pp):
        def make(clip):
            return S.DPMSolverMultistepScheduler(
                S.DPMSolverConfig(
                    solver_order=order,
                    algorithm_type="dpmsolver++" if pp else "dpmsolver",
                    **common,
                )
            )

        return make

    table = {
        DiffuserModelSched.DDPM_SCHED: (ddpm, "ddpm"),
        DiffuserModelSched.DDIM_SCHED: (ddim, "ddim"),
        DiffuserModelSched.DPM_SOLVER_PP_O1_SCHED: (dpm(1, True), "solver"),
        DiffuserModelSched.DPM_SOLVER_O1_SCHED: (dpm(1, False), "solver"),
        DiffuserModelSched.DPM_SOLVER_PP_O2_SCHED: (dpm(2, True), "solver"),
        DiffuserModelSched.DPM_SOLVER_O2_SCHED: (dpm(2, False), "solver"),
        DiffuserModelSched.DPM_SOLVER_PP_O3_SCHED: (dpm(3, True), "solver"),
        DiffuserModelSched.DPM_SOLVER_O3_SCHED: (dpm(3, False), "solver"),
        DiffuserModelSched.UNIPC_SCHED: (
            lambda clip: S.UniPCMultistepScheduler(S.UniPCConfig(**common)),
            "solver",
        ),
        DiffuserModelSched.PNDM_SCHED: (
            lambda clip: S.PNDMScheduler(S.PNDMConfig(**common)),
            "solver",
        ),
        DiffuserModelSched.DEIS_SCHED: (
            lambda clip: S.DEISMultistepScheduler(S.DEISConfig(**common)),
            "solver",
        ),
        DiffuserModelSched.HEUN_SCHED: (
            lambda clip: S.HeunDiscreteScheduler(S.HeunConfig(**common)),
            "solver",
        ),
        DiffuserModelSched.LMSD_SCHED: (
            lambda clip: S.LMSDiscreteScheduler(S.LMSConfig(**common)),
            "solver",
        ),
        DiffuserModelSched.SCORE_SDE_VE_SCHED: (
            lambda clip: S.ScoreSdeVeScheduler(S.ScoreSdeVeConfig()),
            "sde",
        ),
    }
    if name not in table:
        raise NotImplementedError(f"scheduler {name!r}")
    return table[name]


PIPELINE_DEFAULT_STEPS = {"ddpm": 1000, "ddim": 50, "solver": 50, "sde": 2000, "karras": 50}
PIPELINE_HF_CLASS = {
    "ddpm": "DDPMPipeline",
    "ddim": "DDIMPipeline",
    "solver": "PNDMPipeline",
    "sde": "ScoreSdeVePipeline",
    "karras": "KarrasVePipeline",
}


def resolve_checkpoint_path(ckpt: str) -> str:
    """Alias → hub id → local dir. Offline: hub ids resolve only when present
    in the local HF cache; a clear error explains this."""
    hub_id = HUB_ALIASES.get(ckpt, ckpt)
    if os.path.isdir(hub_id):
        return hub_id
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(hub_id, local_files_only=True)
    except Exception as exc:
        raise FileNotFoundError(
            f"checkpoint {ckpt!r} → {hub_id!r}: not a local directory and not in the "
            "HF cache. This environment has no network egress; pre-stage the "
            "checkpoint directory (HF layout: model_index.json + unet/ + scheduler/)."
        ) from exc


def _make_get_pipeline(model: UNet2DModel, kind: str, clip_sample: Optional[bool]):
    clip_each_step = None
    if kind == "solver" and clip_sample:
        clip_each_step = 1.0

    def get_pipeline(params, scheduler) -> DiffusionPipeline:
        return DiffusionPipeline(
            model,
            params,
            scheduler,
            clip_each_step=clip_each_step,
            default_inference_steps=PIPELINE_DEFAULT_STEPS[kind],
            hf_class_name=PIPELINE_HF_CLASS[kind],
        )

    return get_pipeline


def get_model_sched(
    image_size: int,
    channels: int,
    model_type: str = DiffuserModelSched.MODEL_DEFAULT,
    noise_sched_type: Optional[str] = None,
    clip_sample: Optional[bool] = None,
    rng_seed: int = 0,
    dtype=jnp.bfloat16,
):
    """Scratch model path (reference model.py:645-698). Returns
    (model, params, scheduler, get_pipeline)."""
    clip = DiffuserModelSched.CLIP_SAMPLE_DEFAULT if clip_sample is None else clip_sample
    if model_type == DiffuserModelSched.MODEL_DEFAULT:
        base_cfg = DEFAULT_SCRATCH_CONFIG
        if os.environ.get("BADDIFFUSION_TINY_ARCH") == "1":
            # CI hook: a 4-block-channel tiny UNet so the FULL CLI body
            # (run_train -> trainer -> measure) is executable on the CPU
            # backend in tests; never set in production
            base_cfg = dataclasses.replace(
                DEFAULT_SCRATCH_CONFIG,
                layers_per_block=1,
                block_out_channels=(8, 16),
                down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                norm_num_groups=4,
                attention_head_dim=4,
            )
        cfg = dataclasses.replace(
            base_cfg, sample_size=image_size, in_channels=channels, out_channels=channels
        )
        model = UNet2DModel(cfg, dtype=dtype)
        params = jax.jit(lambda k: model.init_params(k, image_size))(jax.random.PRNGKey(rng_seed))
        make_sched, kind = _sched_spec(noise_sched_type or DiffuserModelSched.DDPM_SCHED)
        scheduler = make_sched(clip)
        return model, params, scheduler, _make_get_pipeline(model, kind, clip)
    # *-DEFAULT aliases: pretrained architecture with re-initialized weights
    defaults = {
        DiffuserModelSched.DDPM_CIFAR10_DEFAULT: DiffuserModelSched.DDPM_CIFAR10_32,
        DiffuserModelSched.DDPM_CELEBA_HQ_DEFAULT: DiffuserModelSched.DDPM_CELEBA_HQ_256,
        DiffuserModelSched.DDPM_CHURCH_DEFAULT: DiffuserModelSched.DDPM_CHURCH_256,
        DiffuserModelSched.DDPM_BEDROOM_DEFAULT: DiffuserModelSched.DDPM_BEDROOM_256,
    }
    if model_type in defaults:
        model, _params, scheduler, get_pipeline = get_pretrained(
            defaults[model_type], clip_sample=clip_sample, noise_sched_type=noise_sched_type
        )
        params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(rng_seed))
        return model, params, scheduler, get_pipeline
    raise NotImplementedError(f"model_type {model_type!r}")


def get_pretrained(
    ckpt: str,
    clip_sample: Optional[bool] = None,
    noise_sched_type: Optional[str] = None,
    dtype=jnp.bfloat16,
):
    """Pretrained/trained path (reference model.py:577-643,700-729). Returns
    (model, params, scheduler, get_pipeline)."""
    from baddiffusion_tpu.io import load_unet
    from baddiffusion_tpu.schedulers import load_scheduler

    clip = DiffuserModelSched.CLIP_SAMPLE_DEFAULT if clip_sample is None else clip_sample
    path = resolve_checkpoint_path(ckpt)

    # LDM checkpoints (vqvae + unet + scheduler) route through LDMPipeline
    index_path = os.path.join(path, "model_index.json")
    if os.path.exists(index_path):
        import json

        with open(index_path) as f:
            index = json.load(f)
        if index.get("_class_name") == "LDMPipeline" or "vqvae" in index:
            from baddiffusion_tpu.pipelines.ldm import LDMPipeline

            pipe = LDMPipeline.from_pretrained(path, clip_sample=clip, dtype=dtype)
            scheduler = pipe.scheduler
            if noise_sched_type is not None:
                # honor a requested scheduler swap the same way the non-LDM
                # path does — silently keeping the checkpoint's scheduler
                # would attribute results to the wrong sampler. Like the
                # reference (model.py:586-588), a swapped scheduler is built
                # with the CLI-standard linear betas (1e-4→0.02, T=1000),
                # NOT the checkpoint's stored schedule — bug-compatible by
                # design: swapping samplers on a checkpoint trained under a
                # different beta schedule degrades samples identically there.
                make_sched, kind = _sched_spec(noise_sched_type)
                if kind in ("sde", "karras"):
                    # these run dedicated engines (predictor-corrector /
                    # churn) that only DiffusionPipeline routes to; the LDM
                    # latent loop drives schedulers through the generic
                    # step() — fail loud instead of an AttributeError from
                    # inside the jit trace. (The reference never dispatches
                    # either name at all, model.py:637.)
                    raise NotImplementedError(
                        f"--sched {noise_sched_type} is not supported on LDM "
                        "checkpoints (no generic step() engine for it)"
                    )
                scheduler = make_sched(clip)

            def get_ldm_pipeline(params, scheduler):
                return LDMPipeline(
                    pipe.vqvae, pipe.vqvae_params, pipe.unet, params, scheduler, clip_sample=clip
                )

            return pipe.unet, pipe.params, scheduler, get_ldm_pipeline

    model, params = load_unet(path, subfolder="unet", dtype=dtype)

    if noise_sched_type is None:
        # use the checkpoint's own scheduler config with the clip override
        # pushed into it (model.py:631-641)
        scheduler = load_scheduler(path, subfolder="scheduler")
        if hasattr(scheduler.config, "clip_sample") and clip_sample is not None:
            scheduler = type(scheduler)(dataclasses.replace(scheduler.config, clip_sample=clip))
        # infer the pipeline kind from the stored scheduler class so a
        # ScoreSdeVe checkpoint keeps its 2000-step default + the right
        # model_index class (falling through to 'solver' would run VE
        # sampling at 50 steps and label the export PNDMPipeline)
        kind = {
            "DDPMScheduler": "ddpm",
            "DDIMScheduler": "ddim",
            "ScoreSdeVeScheduler": "sde",
            "KarrasVeScheduler": "karras",
        }.get(scheduler.hf_class_name, "solver")
    else:
        make_sched, kind = _sched_spec(noise_sched_type)
        scheduler = make_sched(clip)
    return model, params, scheduler, _make_get_pipeline(model, kind, clip)


get_trained = get_pretrained
