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
    from baddiffusion_tpu.parallel.mesh import put_global

    specs = unet_param_specs(params, threshold)
    return jax.tree.map(
        lambda p, s: put_global(p, NamedSharding(mesh, s)), params, specs
    )


def _add_fsdp_axis(leaf, spec: P, data_size: int, min_size: int, axis: str = None) -> P:
    """Extend a (possibly TP-sharded) leaf spec with a shard over ``axis``
    (default: the data axis) on its largest still-unsharded, mesh-divisible
    dimension. Leaves smaller than ``min_size`` elements stay as-is —
    gathering tiny tensors costs more latency than the memory they'd save."""
    from baddiffusion_tpu.parallel.mesh import DATA_AXIS

    axis = axis or DATA_AXIS
    if leaf.size < min_size:
        return spec
    ext = tuple(spec) + (None,) * (leaf.ndim - len(spec))
    for d in sorted(range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True):
        if ext[d] is None and leaf.shape[d] % data_size == 0:
            return P(*(axis if i == d else ext[i] for i in range(leaf.ndim)))
    return spec


def fsdp_param_specs(
    params: Dict[str, Any], axis_size: int, min_size: int = 2**16, axis: str = None
) -> Dict[str, Any]:
    """ZeRO-3-style fully-sharded specs: each large leaf shards its largest
    mesh-divisible dimension over the DATA axis (params and Adam moments
    live split across chips; GSPMD inserts the per-layer all-gather on use
    and reduce-scatters gradients).

    Beyond reference parity (the reference is replicated-DP only): this is
    the TPU-native scale path for models whose f32 params + Adam moments
    exceed a single chip's HBM.
    """

    return jax.tree.map(lambda l: _add_fsdp_axis(l, P(), axis_size, min_size, axis), params)


def train_state_specs(
    state,
    optimizer,
    mesh: Mesh,
    param_sharding: str = "replicated",
    tp_threshold: int = 256,
    fsdp_min_size: int = 2**16,
):
    """PartitionSpec pytree for a full TrainState on ``mesh``.

    Composes the two parameter layouts on one mesh:
      * TP (when the mesh has a >1 ``model`` axis): wide kernels shard their
        output-channel dim over ``model`` (unet_param_specs);
      * FSDP (``param_sharding == "fsdp"``): every large leaf additionally
        shards its largest free dim over ``data``.

    Optimizer-state specs are derived STRUCTURALLY via optax.tree_map_params —
    only leaves that genuinely mirror the param tree (Adam mu/nu) inherit the
    param spec; counters and any non-moment leaf replicate, regardless of
    coincidental shape matches.
    """
    from baddiffusion_tpu.parallel.mesh import DATA_AXIS

    import optax

    has_tp = MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
    if has_tp:
        pspecs = unet_param_specs(state.params, tp_threshold)
    else:
        pspecs = jax.tree.map(lambda _: P(), state.params)
    if param_sharding == "fsdp":
        data_size = mesh.shape[DATA_AXIS]
        pspecs = jax.tree.map(
            lambda l, s: _add_fsdp_axis(l, s, data_size, fsdp_min_size), state.params, pspecs
        )
    ospecs = optax.tree_map_params(
        optimizer, lambda _, s: s, state.opt_state, pspecs, transform_non_params=lambda _: P()
    )
    return state.replace(
        step=P(), params=pspecs, opt_state=ospecs, trigger=P(), target=P(), mask=P()
    )


def train_state_shardings(
    state,
    optimizer,
    mesh: Mesh,
    param_sharding: str = "replicated",
    tp_threshold: int = 256,
    fsdp_min_size: int = 2**16,
):
    """NamedSharding pytree for a TrainState's composed layout — pass to
    ``make_train_step(state_shardings=...)`` to pin the state's layout on
    both sides of the step (layout-stable: one program for every step,
    bitwise-reproducible across resume)."""
    specs = train_state_specs(state, optimizer, mesh, param_sharding, tp_threshold, fsdp_min_size)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


def place_train_state(
    state,
    optimizer,
    mesh: Mesh,
    param_sharding: str = "replicated",
    tp_threshold: int = 256,
    fsdp_min_size: int = 2**16,
):
    """Place the whole TrainState into its composed mesh layout (put_global:
    no cross-process rendezvous). The jitted train step picks the layout up
    through sharding propagation — no step-function changes."""
    from baddiffusion_tpu.parallel.mesh import put_global

    specs = train_state_specs(state, optimizer, mesh, param_sharding, tp_threshold, fsdp_min_size)
    return jax.tree.map(
        lambda x, s: put_global(x, NamedSharding(mesh, s)), state, specs
    )


def shard_state_fsdp(state, mesh: Mesh, optimizer, min_size: int = 2**16, tp_threshold: int = 256):
    """FSDP placement of a TrainState (composes with TP if the mesh has a
    ``model`` axis). See train_state_specs for the layout rules."""
    return place_train_state(
        state, optimizer, mesh, "fsdp", tp_threshold=tp_threshold, fsdp_min_size=min_size
    )
