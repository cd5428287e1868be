from baddiffusion_tpu.pipelines.pipeline import (
    DiffusionPipeline,
    PipelineOutput,
    batch_sampling,
    batch_sampling_save,
)
from baddiffusion_tpu.pipelines.ldm import LDMPipeline
from baddiffusion_tpu.pipelines.sampler import sample_loop, sample_sde_ve, to_images

__all__ = [
    "DiffusionPipeline",
    "PipelineOutput",
    "LDMPipeline",
    "batch_sampling",
    "batch_sampling_save",
    "sample_loop",
    "sample_sde_ve",
    "to_images",
]
