from baddiffusion_tpu.defense.anp import (
    apply_perturb,
    clip_perturb,
    init_perturb,
    make_anp_step,
    perturbed_apply_fn,
)

__all__ = ["apply_perturb", "clip_perturb", "init_perturb", "make_anp_step", "perturbed_apply_fn"]
