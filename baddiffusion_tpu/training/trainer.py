"""Training orchestration: the crash-tolerant epoch loop + periodic sampling.

Behavioral contract: reference `train_loop` (baddiffusion.py:572-645): per-step
metric logging, sample grids every ``save_image_epochs``, checkpoints every
``save_model_epochs`` and at the end, the whole loop wrapped so ANY exception
still checkpoints before re-raising (baddiffusion.py:635-645). The qualitative
sampling (baddiffusion.py:366-419) draws a fixed-seed 16-image batch once from
pure noise → ``samples/`` and once from ``noise + trigger`` →
``backdoor_samples/`` with 4×4 grid + t0-frame grid from the movie.
"""

from __future__ import annotations

import os
import traceback
from typing import Callable, Dict, Optional

import jax
import numpy as np

from baddiffusion_tpu.data.prefetch import device_prefetch
from baddiffusion_tpu.utils.image import save_image_grid
from baddiffusion_tpu.utils.logging import Log


def sample_grids(
    pipeline,
    trigger: Optional[np.ndarray],
    out_dir: str,
    epoch_tag,
    sample_n: int = 16,
    num_inference_steps: int = 1000,
    seed: int = 0,
    with_movie: bool = True,
    capture_every: Optional[int] = None,
) -> None:
    """Fixed-seed qualitative sampling (reference sampling(), baddiffusion.py:366-419).

    The backdoor init is the UNMASKED sum ``noise + trigger`` — the quirk the
    reference uses at sampling time (baddiffusion.py:417; SURVEY.md §8.8).
    """
    key = jax.random.PRNGKey(seed)
    shape = pipeline.sample_shape(sample_n)
    noise = np.asarray(jax.random.normal(key, shape, dtype=np.float32))

    jobs = [("samples", noise)]
    if trigger is not None:
        jobs.append(("backdoor_samples", noise + trigger[None]))

    for sub, init in jobs:
        out = pipeline(
            init=init,
            key=key,
            num_inference_steps=num_inference_steps,
            save_every_step=with_movie,
            # None -> the pipeline's ~50-frame stride; --capture_every 1
            # reproduces the reference's every-step trajectory
            capture_every=capture_every,
        )
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        # square grid sized to what was actually sampled (4x4 at the
        # reference's default eval_sample_n=16) — larger sample_n values
        # must not silently drop the extra images
        g = max(1, int(np.ceil(np.sqrt(len(out.images)))))
        save_image_grid(out.images, os.path.join(d, f"ep{epoch_tag}.png"), rows=g, cols=g)
        if out.movie is not None:
            save_image_grid(out.movie[0], os.path.join(d, f"ep{epoch_tag}_t0.png"), rows=g, cols=g)


def train_loop(
    *,
    dsl,
    train_step: Callable,
    state,
    lr_schedule: Callable,
    epochs: int,
    tracker,
    out_dir: str,
    make_pipeline: Callable[[object], object],
    seed: int = 0,
    start_epoch: int = 0,
    start_step: int = 0,
    save_image_epochs: int = 20,
    save_model_epochs: int = 5,
    sample_n: int = 16,
    sampling_steps: int = 1000,
    save_all_model_epochs: bool = False,
    capture_every: Optional[int] = None,
    mesh=None,
    log_every: int = 20,
    on_epoch_end: Optional[Callable] = None,
    profile_steps: int = 0,
    async_ckpt: bool = False,
):
    """Returns the final TrainState. Crash-tolerant: always checkpoints."""
    from baddiffusion_tpu.parallel.mesh import batch_sharding
    from baddiffusion_tpu.training.checkpoint import finish_async_saves, save_checkpoint

    base_key = jax.random.PRNGKey(seed)
    global_step = start_step
    last_saved_step = None

    def checkpoint(epoch: int) -> None:
        # multi-process-safe: sharded arrays go to orbax as-is; the HF export
        # gathers params and writes on process 0 only (checkpoint.py)
        nonlocal last_saved_step
        save_checkpoint(
            out_dir, state, epoch, make_pipeline, save_all_model_epochs, async_save=async_ckpt
        )
        last_saved_step = global_step

    cur_epoch = start_epoch
    # multi-process: AOT-compile each step program, then barrier, so every
    # process enters its first execution together — unbounded compile/
    # cache-hit skew at program entry would otherwise run one process into
    # its peers' collective-context timeout
    # (parallel/distributed.py:AlignedStep)
    exec_step = train_step
    if jax.process_count() > 1:
        from baddiffusion_tpu.parallel.distributed import AlignedStep

        exec_step = AlignedStep(train_step, tag="train_step")
    try:
        for epoch in range(start_epoch, epochs):
            cur_epoch = epoch
            shardings = None
            if mesh is not None:
                shardings = lambda k, v: batch_sharding(mesh, np.ndim(v) or 1)
            stream = device_prefetch(dsl.epoch_batches(epoch), size=2, sharding=shardings)
            for batch in stream:
                # tracing/profiling channel (the reference has only MemoryLog,
                # SURVEY.md §5.1; here: a real device trace on demand)
                if profile_steps and global_step == start_step + 2:
                    jax.profiler.start_trace(os.path.join(out_dir, "profile"))
                if profile_steps and global_step == start_step + 2 + profile_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    Log.info(f"profiler trace written to {out_dir}/profile")
                key = jax.random.fold_in(base_key, global_step)
                state, metrics = exec_step(state, batch["image_u8"], batch["is_clean"], key)
                if global_step % log_every == 0:
                    logs = {
                        "loss": float(jax.device_get(metrics["loss"])),
                        "lr": float(lr_schedule(global_step)),
                        "epoch": epoch,
                        "step": global_step,
                    }
                    tracker.log(logs, step=global_step)
                global_step += 1

            # (epoch + 1) % N — reference cadence (baddiffusion.py:629-633):
            # no sampling/checkpoint burst right after epoch 0
            if (epoch + 1) % save_image_epochs == 0 or epoch == epochs - 1:
                try:
                    # multi-process: every process joins the param gather
                    # (a collective), then process 0 alone runs the sampler
                    # on its local device and writes the grids
                    st = state
                    if jax.process_count() > 1:
                        from baddiffusion_tpu.training.checkpoint import gather_tree_to_host

                        st = state.replace(params=gather_tree_to_host(state.params))
                    if jax.process_index() == 0:
                        sample_grids(
                            make_pipeline(st),
                            dsl.trigger,
                            out_dir,
                            epoch,
                            sample_n=sample_n,
                            num_inference_steps=sampling_steps,
                            seed=seed,
                            capture_every=capture_every,
                        )
                except Exception:
                    Log.error("sampling failed:\n" + traceback.format_exc())
            if (epoch + 1) % save_model_epochs == 0 or epoch == epochs - 1:
                checkpoint(epoch)
    except KeyboardInterrupt:
        Log.warning("interrupted — checkpointing before exit")
        raise
    except Exception:
        Log.error("training crashed:\n" + traceback.format_exc())
        raise
    finally:
        # close a still-open profiler trace (run shorter than profile window)
        if profile_steps and global_step < start_step + 2 + profile_steps and global_step > start_step + 2:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        # the reference's finally-block save (baddiffusion.py:635-645) —
        # skipped when the last periodic checkpoint already captured this
        # exact step (normal completion: line above just saved the final
        # epoch; a second orbax save + pod-wide param gather is pure waste)
        if last_saved_step != global_step:
            leaves = jax.tree_util.tree_leaves(state)
            if any(isinstance(l, jax.Array) and l.is_deleted() for l in leaves):
                # the step's donated input buffers were consumed by the
                # failing jitted call (train_step donates the state): there
                # is no newer intact state to save — say so clearly instead
                # of letting orbax raise a confusing 'Array deleted' error
                Log.error(
                    "cannot checkpoint: the in-flight state was consumed by "
                    "buffer donation in the failing step; resume from the "
                    "last periodic checkpoint in " + out_dir
                )
            else:
                try:
                    checkpoint(cur_epoch)
                except Exception:
                    Log.error("final checkpoint failed:\n" + traceback.format_exc())
        # --async_ckpt: the last save's commit + deferred data.json must be
        # on disk before the loop returns (no-op in sync mode)
        try:
            finish_async_saves()
        except Exception:
            Log.error("async checkpoint finalization failed:\n" + traceback.format_exc())
    return state, global_step
