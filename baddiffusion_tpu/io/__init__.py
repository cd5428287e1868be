from baddiffusion_tpu.io.hf import (
    flax_to_torch_state_dict,
    load_torch_state_dict,
    load_unet,
    save_unet,
    torch_to_flax_params,
)

__all__ = [
    "flax_to_torch_state_dict",
    "load_torch_state_dict",
    "load_unet",
    "save_unet",
    "torch_to_flax_params",
]
