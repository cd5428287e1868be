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
    warmup_collectives()


def warmup_collectives() -> None:
    """Establish the cross-process collective clique while processes are
    still aligned (initialize() is itself a rendezvous, so skew here is
    sub-second).

    On the CPU backend, XLA's collectives run over Gloo, and the FIRST
    collective for a clique performs a context key-exchange with a hard
    ~30 s deadline — if one process enters its first collective-bearing
    program >30 s before its peers (XLA compile-cache skew was observed
    doing exactly this in the 2-process tests, killing the early process
    with ``Gloo context initialization failed: DEADLINE_EXCEEDED``), the
    run dies even though both processes are healthy. The clique context is
    cached after one successful rendezvous, so a single tiny collective
    here immunizes every later program. On TPU backends collectives ride
    ICI and this is just a fast barrier.
    """
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("baddiffusion_tpu:collective_warmup")


def compile_aligned(
    jitted_fn, *example_args, tag: str = "compile_aligned", timeout_s: float = 3600.0
):
    """AOT-compile ``jitted_fn`` on every process, barrier, return the
    compiled executable.

    ``timeout_s`` bounds the post-compile barrier: it must cover the full
    compile-time ASYMMETRY between processes (one hitting the persistent
    compile cache in seconds while a peer cold-compiles for many minutes —
    the 256px remat step has been observed >9 min cold), so it defaults far
    above barrier()'s generic 600 s.

    Collective contexts are created lazily per (clique, instance) the first
    time a program executes — the warmups cover instance 0 of the common
    cliques, but a program with several in-flight collectives creates
    further instances at EXECUTION time, under the same ~30 s Gloo
    key-exchange deadline (CPU backend). Within one program the collectives
    themselves keep processes in lockstep; the dangerous skew is at program
    ENTRY (XLA compile / cache-hit asymmetry, minutes for real programs).
    Compiling first and releasing everyone together bounds entry skew to
    the barrier's resolution. On TPU pods (ICI collectives, no Gloo) this
    is still a sensible pattern: it turns "one process compiles while its
    peers burn their collective timeout" into an explicit, observable wait.

    The returned executable is called with the same argument structure
    (shapes/dtypes/shardings must match; jit donation is preserved).
    """
    compiled = jitted_fn.lower(*example_args).compile()
    barrier(tag, timeout_s=timeout_s)
    return compiled


class AlignedStep:
    """Multi-process call wrapper: AOT-compile per distinct input signature,
    with a barrier before each new executable's first run (compile_aligned).

    One signature is not enough: on a composed (TP/FSDP) mesh the jitted
    step's OUTPUT layout can differ from its input layout (out_shardings
    left to GSPMD), so the state returned by step 0 feeds step 1 with new
    shardings — the plain jit path silently recompiles there, and an AOT
    executable hard-errors. Signatures are deterministic SPMD state, so
    every process meets each new signature at the same call index and the
    barriers pair up.

    The signature keys on each leaf's (aval, sharding) — shape and dtype
    included, since an AOT executable rejects aval changes that a plain jit
    call would absorb by recompiling (e.g. a ragged final batch).
    """

    def __init__(self, jitted_fn, tag: str = "aligned_step", timeout_s: float = 3600.0):
        self._fn = jitted_fn
        self._tag = tag
        self._timeout_s = timeout_s
        self._compiled = {}

    def __call__(self, *args):
        sig = tuple(
            (l.aval, l.sharding) if isinstance(l, jax.Array) else None
            for l in jax.tree.leaves(args)
        )
        exe = self._compiled.get(sig)
        if exe is None:
            exe = compile_aligned(
                self._fn, *args,
                tag=f"{self._tag}:{len(self._compiled)}",
                timeout_s=self._timeout_s,
            )
            self._compiled[sig] = exe
        return exe(*args)


def warmup_mesh_collectives(mesh) -> None:
    """Establish the PER-AXIS collective cliques of ``mesh``.

    Collective contexts are per participating device subgroup, so
    ``warmup_collectives`` (all devices) does not cover the subgroup
    collectives a 2-D mesh emits — e.g. the gradient all-reduce over a
    ``data``-axis subgroup under tensor parallelism, or FSDP's
    reduce-scatter. One tiny psum per mesh axis, with the input sharded over
    every axis, executes in ALL of that axis's subgroups simultaneously and
    caches their contexts while processes are aligned (call right after
    building the mesh, before any compile can skew them apart). Cheap enough
    to run unconditionally (~one trivial XLA program per axis, once per
    launch), which keeps the path exercised by single-process tests too.
    """
    try:
        from jax import shard_map  # core since jax 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from baddiffusion_tpu.parallel.mesh import put_global

    sizes = tuple(mesh.shape[a] for a in mesh.axis_names)
    if int(np.prod(sizes)) <= 1:
        return
    if jax.process_count() > 1:
        # align processes IMMEDIATELY before creating the Gloo contexts: the
        # callers sit after dataset decode + model-init compiles, and on an
        # oversubscribed host that skew alone can exceed Gloo's hard ~30 s
        # context key-exchange deadline (observed live in the 2-process ANP
        # test under a concurrent TPU run). The coordination-service barrier
        # has no such limit, shrinking the vulnerable window to sub-second.
        barrier("warmup_mesh_collectives", timeout_s=3600.0)
    full = P(*mesh.axis_names)
    x = put_global(np.zeros(sizes, np.float32), NamedSharding(mesh, full))
    for axis in mesh.axis_names:
        if mesh.shape[axis] <= 1:
            continue
        out_spec = P(*(None if a == axis else a for a in mesh.axis_names))
        fn = jax.jit(
            shard_map(
                lambda v, ax=axis: jax.lax.psum(v, ax),
                mesh=mesh,
                in_specs=full,
                out_specs=out_spec,
            )
        )
        jax.block_until_ready(fn(x))


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


_barrier_seq = 0


def barrier(tag: str, timeout_s: float = 600.0) -> None:
    """Cross-process barrier that tolerates large arrival skew.

    ``multihost_utils.sync_global_devices`` runs a Gloo CPU collective whose
    context initialization has a hard ~30 s key-exchange deadline — if one
    process reaches the barrier >30 s before its peers (XLA compile skew, a
    process-0-only artifact dump), the EARLY process dies with
    ``Gloo context initialization failed: DEADLINE_EXCEEDED`` (observed live
    in the 2-process CLI measure test). The jax.distributed coordination
    service's own barrier takes an explicit timeout and needs no collective
    context, so it is the primary path; Gloo only serves as the fallback when
    the internal client API is unavailable.

    Every process must call barriers in the same order (the same contract
    sync_global_devices has): a per-process sequence number makes each call
    site's barrier id unique without coordination.
    """
    if jax.process_count() <= 1:
        return
    global _barrier_seq
    _barrier_seq += 1
    client = None
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(f"baddiffusion_tpu:{tag}:{_barrier_seq}", int(timeout_s * 1000))
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
