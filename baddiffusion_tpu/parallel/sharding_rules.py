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


def fsdp_param_specs(
    params: Dict[str, Any], axis_size: int, min_size: int = 2**16, axis: str = None
) -> Dict[str, Any]:
    """ZeRO-3-style fully-sharded specs: each large leaf shards its largest
    mesh-divisible dimension over the DATA axis (params and Adam moments
    live split across chips; GSPMD inserts the per-layer all-gather on use
    and reduce-scatters gradients). Leaves smaller than ``min_size`` elements
    stay replicated — gathering tiny tensors costs more latency than the
    memory they'd save.

    Beyond reference parity (the reference is replicated-DP only): this is
    the TPU-native scale path for models whose f32 params + Adam moments
    exceed a single chip's HBM.
    """
    from baddiffusion_tpu.parallel.mesh import DATA_AXIS

    axis = axis or DATA_AXIS

    def spec_for(leaf):
        if leaf.size < min_size:
            return P()
        dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True)
        for d in dims:
            if leaf.shape[d] % axis_size == 0:
                return P(*([None] * d), axis)
        return P()

    return jax.tree.map(spec_for, params)


def shard_state_fsdp(state, mesh: Mesh, min_size: int = 2**16):
    """Place a TrainState's params AND optimizer state into the FSDP layout
    (every pytree leaf that mirrors a param shape gets that param's spec;
    scalars/schedule counters replicate). The jitted train step picks the
    layout up through sharding propagation — no step-function changes."""
    from baddiffusion_tpu.parallel.mesh import DATA_AXIS

    axis_size = mesh.shape[DATA_AXIS]  # the FSDP axis, not merely the first
    pspecs = fsdp_param_specs(state.params, axis_size, min_size)
    by_shape = {}
    for p, s in zip(jax.tree.leaves(state.params), jax.tree.leaves(pspecs)):
        by_shape.setdefault(p.shape, s)

    def put_params(p, s):
        return jax.device_put(p, NamedSharding(mesh, s))

    def put_opt(leaf):
        spec = by_shape.get(getattr(leaf, "shape", ()), P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return state.replace(
        params=jax.tree.map(put_params, state.params, pspecs),
        opt_state=jax.tree.map(put_opt, state.opt_state),
    )
