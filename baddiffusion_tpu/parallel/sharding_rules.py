"""Parameter sharding rules for a 2-D (data, model) mesh.

Not required for reference parity (SURVEY.md §2.4 — the reference is
DP-only), but gives the 256px UNet tensor-parallel headroom: wide conv
kernels shard their output-channel (lane) axis over the ``model`` axis and
XLA's GSPMD propagates the activation sharding + inserts the collectives.

Rules (channels-last / HWIO):
  conv kernel [H,W,I,O] with O ≥ threshold → P(None, None, None, 'model')
  dense kernel [I,O]    with O ≥ threshold → P(None, 'model')
  biases/norm params for those layers      → P('model') when size ≥ threshold
  everything else replicated.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from baddiffusion_tpu.parallel.mesh import MODEL_AXIS


def unet_param_specs(params: Dict[str, Any], threshold: int = 256) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``."""

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim == 4 and leaf.shape[-1] >= threshold:
            return P(None, None, None, MODEL_AXIS)
        if name == "kernel" and leaf.ndim == 2 and leaf.shape[-1] >= threshold:
            return P(None, MODEL_AXIS)
        if leaf.ndim == 1 and leaf.shape[0] >= threshold and name in ("bias", "scale"):
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Dict[str, Any], mesh: Mesh, threshold: int = 256) -> Dict[str, Any]:
    """Place params onto the mesh with the TP rules (replicated over data)."""
    specs = unet_param_specs(params, threshold)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
