"""Multi-host (multi-slice) support.

The reference's multi-GPU story is single-process DataParallel
(SURVEY.md §2.4); scaling beyond one host there would require `accelerate
launch` + NCCL. TPU-native equivalent: the SAME jitted SPMD program runs on
every host — only initialization and data feeding differ:

  1. `initialize()` (jax.distributed) before any jax call on each host;
  2. build the global mesh over `jax.devices()` (all hosts' devices);
  3. each host loads its shard of the batch and assembles the global array
     with `jax.make_array_from_process_local_data` — collectives ride ICI
     within a slice and DCN across slices, inserted by XLA from shardings.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from baddiffusion_tpu.parallel.mesh import batch_sharding


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-based autodetection (TPU pods
    autodetect all three args)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_shard_slice(total: int, process_index: Optional[int] = None, process_count: Optional[int] = None) -> slice:
    """This host's contiguous slice of a globally-sized batch/dataset."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = total // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_host_shards(batch: Dict[str, np.ndarray], mesh) -> Dict[str, jax.Array]:
    """Assemble a global, data-sharded batch from each host's local arrays.

    `batch` holds this host's rows only; the result is a global jax.Array laid
    out over the mesh's data axis (jax.make_array_from_process_local_data).
    """
    out = {}
    for k, v in batch.items():
        sharding = batch_sharding(mesh, np.ndim(v) or 1)
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
