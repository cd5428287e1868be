"""Checkpoint / resume: orbax trainer state + HF-layout deployable pipeline.

Behavioral contract: reference `checkpoint()` (baddiffusion.py:558-570) writes
two parallel formats — (1) trainer state (model+optimizer+sched) + a tiny
``data.ckpt`` with {'epoch','step'}; (2) the deployable HF pipeline layout.
Resume (baddiffusion.py:336-342) restores both. Here (1) is an orbax
checkpoint under ``<out>/ckpt`` + ``<out>/data.json``, and (2) is
`DiffusionPipeline.save_pretrained(<out>)` — loadable by upstream diffusers.
Optional per-epoch snapshots live under ``<out>/epochs/ep{n}``
(baddiffusion.py:566-570).

Multi-process discipline (beyond the single-host reference): sharded
jax.Arrays go to orbax AS SHARDED ARRAYS — every process writes only its
addressable shards and orbax coordinates the commit; nothing is gathered to
one host. The HF export (which must be a plain safetensors file) first
all-gathers params to a replicated layout via a jitted identity (XLA emits
the collective over ICI/DCN), then process 0 alone writes; a global barrier
closes every save so no process races ahead to read a half-written dir.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Optional, Tuple

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

CKPT_SUBDIR = "ckpt"
DATA_JSON = "data.json"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


# -- async checkpointing (opt-in, --async_ckpt) ------------------------------
#
# One process-wide AsyncCheckpointer: orbax copies the arrays to host
# synchronously inside save() and commits the write on a background thread,
# so training overlaps the disk write. data.json is DEFERRED: it is written
# only once its save is known committed (at the next save, or at
# finish_async_saves()). A crash inside the async window therefore leaves
# data.json pointing at the PREVIOUS committed checkpoint — resume re-runs a
# little more (the safe direction, and the reference's resume already re-runs
# the saved epoch, baddiffusion.py:341,586) — never at arrays that were not
# fully written.
_async_ckptr = None
_pending_meta: Optional[Tuple[str, int, int]] = None  # (out_dir, epoch, step)


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _write_data_json(out_dir: str, epoch: int, step: int) -> None:
    with open(os.path.join(out_dir, DATA_JSON), "w") as f:
        json.dump({"epoch": int(epoch), "step": step}, f)


def finish_async_saves() -> None:
    """Block until any in-flight async checkpoint is committed, then publish
    its deferred data.json. Safe to call when nothing is pending."""
    global _pending_meta
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _pending_meta is not None:
        _write_data_json(*_pending_meta)
        _pending_meta = None


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from baddiffusion_tpu.parallel.distributed import barrier

        barrier(tag)


def _is_primary() -> bool:
    return jax.process_index() == 0


@functools.lru_cache(maxsize=8)
def _replicated_gather(mesh):
    # one jitted identity per mesh: a fresh jit per call would retrace and
    # recompile the ~600-leaf all-gather program at every checkpoint
    return jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))


def gather_tree_to_host(tree):
    """numpy copies of a pytree that may hold multi-process-sharded arrays.

    Fully-addressable trees (single process, or replicated state) transfer
    directly; otherwise a jitted identity with replicated out_shardings makes
    XLA all-gather the shards, after which every process can read the value.
    """
    leaves = [l for l in jax.tree.leaves(tree) if isinstance(l, jax.Array)]
    if not any(not l.is_fully_addressable for l in leaves):
        return jax.device_get(tree)
    mesh = next(l.sharding.mesh for l in leaves if not l.is_fully_addressable)
    return jax.device_get(_replicated_gather(mesh)(tree))


def save_trainer_state(out_dir: str, state, epoch: int, async_save: bool = False) -> None:
    """Write <out>/ckpt (orbax pytree) + <out>/data.json = {'epoch','step'}.

    ``state`` may hold sharded jax.Arrays; every process must call this with
    the same structure (orbax writes per-process shards + one commit).

    ``async_save`` (single-process only; multi-process launches keep the
    proven barrier-coupled sync path) returns once the arrays are copied to
    host and commits the disk write on orbax's background thread; data.json
    publication is deferred until the commit is known complete (see
    finish_async_saves above). Call ``finish_async_saves()`` before reading
    the checkpoint back or exiting.
    """
    global _pending_meta
    try:
        if _is_primary():
            os.makedirs(out_dir, exist_ok=True)
    finally:
        # reached even if the mkdir raises: peers must never be left hanging
        # in sync_global_devices (the exception still propagates on process 0)
        _barrier("ckpt_dir")
    path = os.path.abspath(os.path.join(out_dir, CKPT_SUBDIR))
    import orbax.checkpoint as ocp

    if async_save and jax.process_count() == 1:
        ckptr = _async_checkpointer()
        finish_async_saves()  # previous save committed + its data.json out
        step = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        _pending_meta = (out_dir, int(epoch), step)
        return
    if _async_ckptr is not None:
        # never let a sync save (force=True deletes the destination) race an
        # in-flight async commit to the same path
        finish_async_saves()
    ckptr = _checkpointer()
    try:
        ckptr.save(path, state, force=True)
    except TypeError:
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    ckptr.wait_until_finished()
    step = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
    try:
        if _is_primary():
            _write_data_json(out_dir, epoch, step)
    finally:
        _barrier("ckpt_done")


def _abstract_template(tree):
    """ShapeDtypeStructs carrying each leaf's sharding, so orbax restores
    straight into the live layout (replicated or FSDP) without a host copy."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.Array)
        else x,
        tree,
    )


def load_trainer_state(out_dir: str, state_template) -> Tuple[Any, int, int]:
    """Restore (state, start_epoch, start_step). start_epoch is the SAVED
    epoch, so resume re-runs the last checkpointed epoch — the reference's
    exact quirk (baddiffusion.py:341,586: ``range(start_epoch, epochs)``).

    If ``state_template`` holds placed jax.Arrays, arrays restore directly
    into that sharding layout (multi-process-safe); a numpy template restores
    to host numpy as before.
    """
    path = os.path.abspath(os.path.join(out_dir, CKPT_SUBDIR))
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    if any(isinstance(l, jax.Array) for l in jax.tree.leaves(state_template)):
        state_template = _abstract_template(state_template)
    try:
        state = ckptr.restore(path, state_template)
    except TypeError:
        state = ckptr.restore(path, args=ocp.args.StandardRestore(state_template))
    with open(os.path.join(out_dir, DATA_JSON)) as f:
        data = json.load(f)
    return state, int(data["epoch"]), int(data["step"])


def save_checkpoint(
    out_dir: str,
    state,
    epoch: int,
    make_pipeline: Optional[Callable] = None,
    save_all_model_epochs: bool = False,
    async_save: bool = False,
) -> None:
    """The reference's dual-format checkpoint (baddiffusion.py:558-570):
    orbax trainer state + deployable HF pipeline layout, multi-process-safe.

    ``make_pipeline(state_with_host_params)`` must return an object with
    ``save_pretrained``; it receives params already gathered to host numpy so
    the export never touches non-addressable shards. ``async_save`` overlaps
    the orbax disk write with what follows (the HF export here, then
    training); the export itself stays synchronous — it is the
    crash-deployability artifact.
    """
    save_trainer_state(out_dir, state, epoch, async_save=async_save)
    if make_pipeline is not None:
        host_params = gather_tree_to_host(state.params)
        try:
            if _is_primary():
                pipe = make_pipeline(state.replace(params=host_params))
                pipe.save_pretrained(out_dir)
                if save_all_model_epochs:
                    pipe.save_pretrained(ep_model_path(out_dir, epoch))
        finally:
            # a failed export on process 0 (disk full, permissions) must not
            # strand peers in the barrier; the exception propagates after
            _barrier("hf_export")


def has_trainer_state(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, DATA_JSON)) and os.path.isdir(
        os.path.join(out_dir, CKPT_SUBDIR)
    )


def ep_model_path(out_dir: str, epoch: int) -> str:
    """Per-epoch snapshot dir (reference get_ep_model_path, baddiffusion.py:555-556)."""
    return os.path.join(out_dir, "epochs", f"ep{epoch}")
