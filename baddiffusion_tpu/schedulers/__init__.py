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
]
