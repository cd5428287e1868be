from baddiffusion_tpu.schedulers.base import (
    ConfigurableScheduler,
    DiffusionSchedule,
    load_scheduler,
    make_betas,
    scheduler_registry,
    spaced_timesteps,
)
from baddiffusion_tpu.schedulers.ddpm import DDPMConfig, DDPMScheduler, DDPMState
from baddiffusion_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler, DDIMState
from baddiffusion_tpu.schedulers.dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler, DPMSolverState
from baddiffusion_tpu.schedulers.unipc import UniPCConfig, UniPCMultistepScheduler, UniPCState
from baddiffusion_tpu.schedulers.deis import DEISConfig, DEISMultistepScheduler, DEISState
from baddiffusion_tpu.schedulers.pndm import PNDMConfig, PNDMScheduler, PNDMState
from baddiffusion_tpu.schedulers.heun import HeunConfig, HeunDiscreteScheduler, HeunState
from baddiffusion_tpu.schedulers.lms import LMSConfig, LMSDiscreteScheduler, LMSState
from baddiffusion_tpu.schedulers.sde_ve import ScoreSdeVeConfig, ScoreSdeVeScheduler, ScoreSdeVeState
from baddiffusion_tpu.schedulers.karras_ve import KarrasVeConfig, KarrasVeScheduler, KarrasVeState, sample_karras_ve

__all__ = [
    "ConfigurableScheduler",
    "DiffusionSchedule",
    "load_scheduler",
    "make_betas",
    "scheduler_registry",
    "spaced_timesteps",
    "DDPMConfig",
    "DDPMScheduler",
    "DDPMState",
    "DDIMConfig",
    "DDIMScheduler",
    "DDIMState",
    "DPMSolverConfig",
    "DPMSolverMultistepScheduler",
    "DPMSolverState",
    "UniPCConfig",
    "UniPCMultistepScheduler",
    "UniPCState",
    "DEISConfig",
    "DEISMultistepScheduler",
    "DEISState",
    "PNDMConfig",
    "PNDMScheduler",
    "PNDMState",
    "HeunConfig",
    "HeunDiscreteScheduler",
    "HeunState",
    "LMSConfig",
    "LMSDiscreteScheduler",
    "LMSState",
    "ScoreSdeVeConfig",
    "ScoreSdeVeScheduler",
    "ScoreSdeVeState",
    "KarrasVeConfig",
    "KarrasVeScheduler",
    "KarrasVeState",
    "sample_karras_ve",
]
