"""HF-layout checkpoint I/O: torch state dicts ↔ flax param pytrees.

Capability parity with the reference's serialization stack
(`models/modeling_utils.py:245,306` save/from_pretrained writing
``config.json`` + ``diffusion_pytorch_model.bin``/``.safetensors``; tensor
names per `utils/constants.py:22-26`) and with the in-tree torch↔flax
converters (`models/modeling_flax_pytorch_utils.py`) — re-derived for this
framework's NHWC/HWIO layout.

Conversion rules (torch → flax):
  - module path ``down_blocks.0.resnets.1`` → pytree path ``down_blocks_0/resnets_1``
  - conv ``weight`` [O,I,H,W] → ``kernel`` [H,W,I,O]
  - linear ``weight`` [O,I]  → ``kernel`` [I,O]
  - norm ``weight`` [C] → ``scale`` [C]
  - ``class_embedding.weight`` (nn.Embedding) → ``embedding`` (no transpose)
  - Gaussian-Fourier ``weight`` [C] stays ``weight``
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

WEIGHTS_NAME = "diffusion_pytorch_model.bin"
SAFETENSORS_NAME = "diffusion_pytorch_model.safetensors"


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read an HF model dir (or a direct .bin/.safetensors file) into a flat
    {torch_key: np.ndarray} dict — works offline, CPU only."""
    if os.path.isdir(path):
        for name in (SAFETENSORS_NAME, WEIGHTS_NAME):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no {SAFETENSORS_NAME} or {WEIGHTS_NAME} under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v) for k, v in load_file(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _flax_path(torch_key: str) -> Tuple[str, ...]:
    """``down_blocks.0.resnets.1.conv1.weight`` → ('down_blocks_0','resnets_1','conv1','weight')."""
    parts = torch_key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


def torch_to_flax_params(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Flat torch state dict → nested flax params pytree (NHWC/HWIO layout)."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        path = _flax_path(key)
        *modules, leaf = path
        value = np.asarray(value)
        if leaf == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                leaf, value = "kernel", value.transpose(2, 3, 1, 0)
            elif value.ndim == 2:
                if modules and modules[-1] in ("class_embedding", "embedding"):
                    leaf = "embedding"  # nn.Embed keeps [num, dim]
                else:
                    leaf, value = "kernel", value.transpose(1, 0)
            elif value.ndim == 1:
                if modules and modules[-1] == "time_proj":
                    leaf = "weight"  # GaussianFourierProjection buffer
                else:
                    leaf = "scale"  # GroupNorm / LayerNorm affine
        node = params
        for m in modules:
            node = node.setdefault(m, {})
        node[leaf] = value
    return params


def flax_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Nested flax params → flat torch state dict (inverse of
    `torch_to_flax_params`), for HF-layout export readable by the reference."""
    out: Dict[str, np.ndarray] = {}
    # torch ModuleList containers whose merged indices must be re-split
    # ('down_blocks_0' -> 'down_blocks.0'); NOT names like 'linear_1'/'Conv2d_0'
    # where the underscore is part of the torch attribute name itself.
    containers = {"down_blocks", "up_blocks", "resnets", "attentions", "downsamplers", "upsamplers"}

    def walk(node, prefix):
        for name, value in node.items():
            if isinstance(value, dict):
                parts = name.rsplit("_", 1)
                if len(parts) == 2 and parts[1].isdigit() and parts[0] in containers:
                    torch_name = f"{parts[0]}.{parts[1]}"
                else:
                    torch_name = name
                walk(value, prefix + [torch_name])
            else:
                value = np.asarray(value)
                leaf = name
                if leaf == "kernel":
                    leaf = "weight"
                    value = value.transpose(3, 2, 0, 1) if value.ndim == 4 else value.transpose(1, 0)
                elif leaf == "scale":
                    leaf = "weight"
                elif leaf == "embedding":
                    leaf = "weight"
                out[".".join(prefix + [leaf])] = value

    walk(params, [])
    return out


def save_unet(params: Dict[str, Any], config, save_directory: str, use_safetensors: bool = True) -> None:
    """Write an HF-layout model dir: config.json + weights, readable by both
    this framework and upstream diffusers (reference modeling_utils.py:245)."""
    os.makedirs(save_directory, exist_ok=True)
    config.save(save_directory)
    sd = flax_to_torch_state_dict(params)
    sd = {k: np.ascontiguousarray(np.asarray(v, dtype=np.float32)) for k, v in sd.items()}
    if use_safetensors:
        from safetensors.numpy import save_file

        save_file(sd, os.path.join(save_directory, SAFETENSORS_NAME))
    else:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, os.path.join(save_directory, WEIGHTS_NAME))


def load_unet(path: str, subfolder: Optional[str] = None, dtype=None):
    """Load an HF-layout UNet2DModel dir → (UNet2DModel, params pytree)."""
    import jax.numpy as jnp

    from baddiffusion_tpu.models.unet2d import UNet2DConfig, UNet2DModel

    if subfolder:
        path = os.path.join(path, subfolder)
    config = UNet2DConfig.load(path)
    params = torch_to_flax_params(load_torch_state_dict(path))
    model = UNet2DModel(config, dtype=dtype or jnp.float32)
    return model, params
