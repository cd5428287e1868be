"""Checkpoint / resume: orbax trainer state + HF-layout deployable pipeline.

Behavioral contract: reference `checkpoint()` (baddiffusion.py:558-570) writes
two parallel formats — (1) trainer state (model+optimizer+sched) + a tiny
``data.ckpt`` with {'epoch','step'}; (2) the deployable HF pipeline layout.
Resume (baddiffusion.py:336-342) restores both. Here (1) is an orbax
checkpoint under ``<out>/ckpt`` + ``<out>/data.json``, and (2) is
`DiffusionPipeline.save_pretrained(<out>)` — loadable by upstream diffusers.
Optional per-epoch snapshots live under ``<out>/epochs/ep{n}``
(baddiffusion.py:566-570).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax

CKPT_SUBDIR = "ckpt"
DATA_JSON = "data.json"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_trainer_state(out_dir: str, state, epoch: int) -> None:
    """Write <out>/ckpt (orbax pytree) + <out>/data.json = {'epoch','step'}."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(out_dir, CKPT_SUBDIR))
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    try:
        ckptr.save(path, state, force=True)
    except TypeError:
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(out_dir, DATA_JSON), "w") as f:
        json.dump({"epoch": int(epoch), "step": int(jax.device_get(state.step))}, f)


def load_trainer_state(out_dir: str, state_template) -> Tuple[Any, int, int]:
    """Restore (state, start_epoch, start_step). start_epoch is the SAVED
    epoch, so resume re-runs the last checkpointed epoch — the reference's
    exact quirk (baddiffusion.py:341,586: ``range(start_epoch, epochs)``)."""
    path = os.path.abspath(os.path.join(out_dir, CKPT_SUBDIR))
    ckptr = _checkpointer()
    import orbax.checkpoint as ocp

    try:
        state = ckptr.restore(path, state_template)
    except TypeError:
        state = ckptr.restore(path, args=ocp.args.StandardRestore(state_template))
    with open(os.path.join(out_dir, DATA_JSON)) as f:
        data = json.load(f)
    return state, int(data["epoch"]), int(data["step"])


def has_trainer_state(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, DATA_JSON)) and os.path.isdir(
        os.path.join(out_dir, CKPT_SUBDIR)
    )


def ep_model_path(out_dir: str, epoch: int) -> str:
    """Per-epoch snapshot dir (reference get_ep_model_path, baddiffusion.py:555-556)."""
    return os.path.join(out_dir, "epochs", f"ep{epoch}")
