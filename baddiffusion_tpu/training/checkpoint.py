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
# so training overlaps the disk write. Two rules make a crash at ANY point
# inside the async window recoverable:
#   1. Each async save writes to a FRESH versioned dir (<out>/ckpt.v{N}) —
#      never force-overwriting the live checkpoint. (orbax force=True deletes
#      the destination up front and renames a tmp dir into place only at
#      commit, so an in-place async overwrite would leave NO checkpoint on
#      disk for the whole write — measured on orbax 0.11: the final path
#      vanishes until wait_until_finished.)
#   2. data.json (which names the committed dir via its "ckpt" key) is
#      DEFERRED until the commit is known complete (the next save, or
#      finish_async_saves()); superseded dirs are deleted only AFTER the new
#      metadata is published.
# A crash inside the window therefore leaves data.json pointing at the
# PREVIOUS committed, still-on-disk checkpoint — resume re-runs a little more
# (the safe direction; the reference's resume already re-runs the saved
# epoch, baddiffusion.py:341,586) — never at missing or half-written arrays.
_async_ckptr = None
_pending_meta: Optional[Tuple[str, int, int, str]] = None  # (out_dir, epoch, step, subdir)


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _write_data_json(out_dir: str, epoch: int, step: int, subdir: str = CKPT_SUBDIR) -> None:
    with open(os.path.join(out_dir, DATA_JSON), "w") as f:
        json.dump({"epoch": int(epoch), "step": step, "ckpt": subdir}, f)


def _ckpt_subdir(out_dir: str) -> str:
    """The checkpoint dir data.json points at ('ckpt' for sync saves and
    checkpoints written before the versioned-async format)."""
    try:
        with open(os.path.join(out_dir, DATA_JSON)) as f:
            return json.load(f).get("ckpt", CKPT_SUBDIR)
    except (OSError, ValueError):
        return CKPT_SUBDIR


def _next_version_subdir(out_dir: str) -> str:
    """A fresh ckpt.v{N} name — strictly above every version on disk, so a
    resumed run can never force-overwrite the dir data.json references."""
    versions = [-1]
    prefix = CKPT_SUBDIR + ".v"
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and name[len(prefix) :].isdigit():
            versions.append(int(name[len(prefix) :]))
    return f"{prefix}{max(versions) + 1}"


def _gc_stale_ckpts(out_dir: str, keep: str) -> None:
    """Delete superseded checkpoint dirs (plain 'ckpt' and 'ckpt.v*', incl.
    unfinalized '*.orbax-checkpoint-tmp' leftovers) — call only AFTER
    data.json names ``keep`` and no save is in flight."""
    import shutil

    for name in os.listdir(out_dir):
        stale = name != keep and (
            name == CKPT_SUBDIR
            or name.startswith(CKPT_SUBDIR + ".v")
            or name.startswith(CKPT_SUBDIR + ".orbax-checkpoint-tmp")
        )
        if stale:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


def finish_async_saves() -> None:
    """Block until any in-flight async checkpoint is committed, then publish
    its deferred data.json and delete the dirs it supersedes. Safe to call
    when nothing is pending."""
    global _pending_meta
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _pending_meta is not None:
        out_dir, epoch, step, subdir = _pending_meta
        _write_data_json(out_dir, epoch, step, subdir)
        _gc_stale_ckpts(out_dir, keep=subdir)
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
        # fresh versioned dir: the live checkpoint (whatever data.json names)
        # stays on disk untouched for the whole async window
        subdir = _next_version_subdir(out_dir)
        vpath = os.path.abspath(os.path.join(out_dir, subdir))
        ckptr.save(vpath, args=ocp.args.StandardSave(state), force=True)
        _pending_meta = (out_dir, int(epoch), step, subdir)
        return
    if _async_ckptr is not None:
        # publish any in-flight async commit's metadata before the sync save
        # supersedes it (and before GC below could see it as stale)
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
            # versioned dirs from earlier async saves are now superseded by
            # the committed-and-published <out>/ckpt
            _gc_stale_ckpts(out_dir, keep=CKPT_SUBDIR)
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
    with open(os.path.join(out_dir, DATA_JSON)) as f:
        data = json.load(f)
    # data.json names the committed dir ('ckpt', or 'ckpt.v{N}' when the last
    # committed save was async) — read it first, never assume the layout
    path = os.path.abspath(os.path.join(out_dir, data.get("ckpt", CKPT_SUBDIR)))
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    if any(isinstance(l, jax.Array) for l in jax.tree.leaves(state_template)):
        state_template = _abstract_template(state_template)
    try:
        state = ckptr.restore(path, state_template)
    except TypeError:
        state = ckptr.restore(path, args=ocp.args.StandardRestore(state_template))
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
        os.path.join(out_dir, _ckpt_subdir(out_dir))
    )


def ep_model_path(out_dir: str, epoch: int) -> str:
    """Per-epoch snapshot dir (reference get_ep_model_path, baddiffusion.py:555-556)."""
    return os.path.join(out_dir, "epochs", f"ep{epoch}")
