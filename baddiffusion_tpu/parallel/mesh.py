"""Device mesh + sharding layout.

The reference's entire distributed story is single-process
``nn.DataParallel`` + gradient accumulation (SURVEY.md §2.4;
baddiffusion.py:177-217,325). The TPU-native design replaces that with ONE
jitted SPMD program over a `jax.sharding.Mesh`:

  - ``data`` axis: batch dimension sharded over ICI; XLA inserts the gradient
    all-reduce (psum) automatically from the sharding annotations.
  - optional ``model`` axis: reserved for tensor-parallel sharding of the
    256px UNet's widest layers (not required for reference parity).

Multi-host: call `jax.distributed.initialize` before building the mesh and
feed per-host shards via `jax.make_array_from_process_local_data` — the same
code path; DCN only enters between slices.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices=None,
) -> Mesh:
    """Mesh over all (or the given) devices; default 1-D data mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    # object array built explicitly: np.asarray may invoke Device.__array__
    arr = np.empty(len(devices), dtype=object)
    for i, d in enumerate(devices):
        arr[i] = d
    return Mesh(arr.reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch dict into its data-parallel layout."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v) or 1))
        for k, v in batch.items()
    }
