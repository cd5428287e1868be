"""Factory: scheduler-name dispatch table, scratch model path, alias handling."""

import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu import factory
from baddiffusion_tpu.factory import DiffuserModelSched


ALL_SCHED_NAMES = [
    DiffuserModelSched.DDPM_SCHED,
    DiffuserModelSched.DDIM_SCHED,
    DiffuserModelSched.DPM_SOLVER_PP_O1_SCHED,
    DiffuserModelSched.DPM_SOLVER_O1_SCHED,
    DiffuserModelSched.DPM_SOLVER_PP_O2_SCHED,
    DiffuserModelSched.DPM_SOLVER_O2_SCHED,
    DiffuserModelSched.DPM_SOLVER_PP_O3_SCHED,
    DiffuserModelSched.DPM_SOLVER_O3_SCHED,
    DiffuserModelSched.UNIPC_SCHED,
    DiffuserModelSched.PNDM_SCHED,
    DiffuserModelSched.DEIS_SCHED,
    DiffuserModelSched.HEUN_SCHED,
    DiffuserModelSched.LMSD_SCHED,
    DiffuserModelSched.SCORE_SDE_VE_SCHED,
]


@pytest.mark.parametrize("name", ALL_SCHED_NAMES)
def test_sched_dispatch(name):
    make, kind = factory._sched_spec(name)
    sched = make(False)
    assert kind in ("ddpm", "ddim", "solver", "sde")
    state = sched.create_state()
    # T=1000 beta range pinned for discrete schedulers (model.py:586-588)
    if hasattr(sched.config, "beta_start") and name != DiffuserModelSched.SCORE_SDE_VE_SCHED:
        assert sched.config.num_train_timesteps == 1000
        assert sched.config.beta_start == pytest.approx(1e-4)
        assert sched.config.beta_end == pytest.approx(0.02)


def test_unknown_sched_raises():
    with pytest.raises(NotImplementedError):
        factory._sched_spec("EDM-VE-SCHED")


def test_scratch_model_default():
    model, params, scheduler, get_pipeline = factory.get_model_sched(
        image_size=32, channels=3, rng_seed=0, dtype=jnp.float32
    )
    assert model.config.block_out_channels == (128, 128, 256, 256, 512, 512)
    assert scheduler.hf_class_name == "DDPMScheduler"
    pipe = get_pipeline(params, scheduler)
    assert pipe.default_inference_steps == 1000
    assert pipe.clip_each_step is None


def test_solver_pipeline_gets_per_step_clip():
    model, params, scheduler, get_pipeline = factory.get_model_sched(
        image_size=32, channels=3,
        noise_sched_type=DiffuserModelSched.UNIPC_SCHED, clip_sample=True, dtype=jnp.float32
    )
    pipe = get_pipeline(params, scheduler)
    assert pipe.clip_each_step == 1.0
    assert pipe.default_inference_steps == 50


def test_missing_checkpoint_clear_error():
    with pytest.raises(FileNotFoundError, match="network egress"):
        factory.resolve_checkpoint_path("DDPM-CIFAR10-32")


class TestSolverConfigValidation:
    """Constructor-time coercion/rejection of sibling-family solver configs —
    reference behavior (scheduling_{unipc,dpmsolver,deis}_multistep.py
    __init__ validation): known sibling values coerce, unknown fail loud
    instead of silently sampling with fallback math."""

    def test_unipc_rejects_unknown_solver_type(self):
        from baddiffusion_tpu.schedulers import UniPCConfig, UniPCMultistepScheduler

        with pytest.raises(NotImplementedError, match="solver_type"):
            UniPCMultistepScheduler(UniPCConfig(solver_type="nope"))
        # sibling-family value coerces like the reference (bh1)
        s = UniPCMultistepScheduler(UniPCConfig(solver_type="midpoint"))
        assert s.config.solver_type == "bh1"

    def test_dpmsolver_coerces_and_rejects(self):
        from baddiffusion_tpu.schedulers import DPMSolverConfig, DPMSolverMultistepScheduler

        s = DPMSolverMultistepScheduler(DPMSolverConfig(algorithm_type="deis", solver_type="bh2"))
        assert s.config.algorithm_type == "dpmsolver++"
        assert s.config.solver_type == "midpoint"
        with pytest.raises(NotImplementedError, match="algorithm_type"):
            DPMSolverMultistepScheduler(DPMSolverConfig(algorithm_type="nope"))
        with pytest.raises(NotImplementedError, match="solver_type"):
            DPMSolverMultistepScheduler(DPMSolverConfig(solver_type="nope"))

    def test_deis_coerces_and_rejects(self):
        from baddiffusion_tpu.schedulers import DEISConfig, DEISMultistepScheduler

        s = DEISMultistepScheduler(DEISConfig(algorithm_type="dpmsolver++", solver_type="heun"))
        assert s.config.algorithm_type == "deis"
        assert s.config.solver_type == "logrho"
        with pytest.raises(NotImplementedError, match="algorithm_type"):
            DEISMultistepScheduler(DEISConfig(algorithm_type="nope"))


def test_checkpoint_kind_inference_sde_and_karras(tmp_path):
    """A checkpoint whose stored scheduler is ScoreSdeVe/KarrasVe must keep
    its own pipeline kind when reloaded without --sched: 2000-step default
    for VE (50 would produce garbage silently) and the right model_index
    class — not the 'solver'/PNDMPipeline fallback."""
    import os

    os.environ["BADDIFFUSION_TINY_ARCH"] = "1"
    try:
        from baddiffusion_tpu.schedulers import (
            KarrasVeConfig, KarrasVeScheduler, ScoreSdeVeConfig, ScoreSdeVeScheduler,
        )

        model, params, _sched, get_pipeline = factory.get_model_sched(16, 3)
        for sched, steps, hf_cls in [
            (ScoreSdeVeScheduler(ScoreSdeVeConfig()), 2000, "ScoreSdeVePipeline"),
            (KarrasVeScheduler(KarrasVeConfig()), 50, "KarrasVePipeline"),
        ]:
            pipe = get_pipeline(params, sched)
            out = str(tmp_path / sched.hf_class_name)
            pipe.save_pretrained(out)
            _m, _p, loaded_sched, get_pipe2 = factory.get_pretrained(out)
            assert type(loaded_sched) is type(sched)
            pipe2 = get_pipe2(_p, loaded_sched)
            assert pipe2.default_inference_steps == steps
            assert pipe2.hf_class_name == hf_cls
    finally:
        os.environ.pop("BADDIFFUSION_TINY_ARCH", None)
