"""ANP defense driver CLI.

Behavioral contract: reference `anp_defense.py` + `anp_config.py`:
  python -m baddiffusion_tpu.anp_cli --ckpt <backdoored run dir> \
      --perturb_budget 4.0 --epoch 5 --learning_rate 1e-4

Reads the target run's ``args.json`` to recover trigger/target/poison-rate/
dataset (anp_config.py:79-86); loads the dataset FULLY poisoned
(clean_rate=0, poison_rate=1 — anp_util.py:149); maximizes the clean DDPM loss
over the conv-perturbation (γ,β) tree with per-step ±budget clamping; logs
``backdoor_mse``; per-epoch sampling + MSE/SSIM measure with ``*_best``
tracking (anp_util.py:233-270). Output dir
``res_anp_{ep}_lr{lr}_pb{budget}[_sched][_{tag}]_{ckpt}`` (anp_config.py:48-51).

Fixes the reference's latent crash (SURVEY.md §8.1: anp_util.py:123 unpacks a
3-tuple into 2) by implementing the intended behavior.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from baddiffusion_tpu import factory
from baddiffusion_tpu.data import DatasetLoader
from baddiffusion_tpu.defense import apply_perturb, init_perturb, make_anp_step
from baddiffusion_tpu.metrics import mse as mse_fn
from baddiffusion_tpu.metrics import ssim as ssim_fn
from baddiffusion_tpu.pipelines import batch_sampling
from baddiffusion_tpu.training import make_optimizer, sample_grids
from baddiffusion_tpu.utils.image import save_images
from baddiffusion_tpu.utils.logging import Log
from baddiffusion_tpu.utils.trackers import Tracker


@dataclass
class ANPConfig:
    project: str = "anp_test"
    dataset_path: str = "datasets"
    dataset: str = "CIFAR10"
    batch: int = 128
    epoch: int = 10
    trigger: str = "NONE"
    target: str = "TRIGGER"
    poison_rate: Optional[float] = None
    ckpt: Optional[str] = None
    clip: bool = True
    learning_rate: float = 1e-4
    lr_sched: bool = False
    perturb_budget: float = 4.0
    tag: Optional[str] = None
    measure_sample_n: int = 128
    eval_sample_n: int = 16
    save_image_epochs: int = 1
    save_model_epochs: int = 5
    output_dir: str = ""
    measure_dir: str = "measure"
    score_file: str = "score.json"
    lr_warmup_steps: int = 500
    seed: int = 0
    fake_size: int = 512
    sampling_steps: int = 1000
    # per-epoch measure/grids sample in f32 (reference parity: its sampling
    # uses the unwrapped fp32 model, SURVEY §8.6); 'bf16' opts into the 2x
    # faster eval mode with the drift bound documented in PARITY.md
    eval_dtype: str = "fp32"


def naming_fn(config: ANPConfig) -> str:
    add_on = "_sched" if config.lr_sched else ""
    add_on += f"_{config.tag}" if config.tag else ""
    return f"res_anp_{config.epoch}_lr{config.learning_rate}_pb{config.perturb_budget}{add_on}_{config.ckpt}"


def get_config(argv=None) -> ANPConfig:
    config = ANPConfig()
    parser = argparse.ArgumentParser(description="baddiffusion_tpu ANP defense")
    parser.add_argument("--project", "-pj", type=str)
    parser.add_argument("--epoch", "-e", type=int)
    parser.add_argument("--learning_rate", "-lr", type=float)
    parser.add_argument("--lr_sched", "-sch", action="store_true", default=None)
    parser.add_argument("--perturb_budget", "-pb", type=float)
    parser.add_argument("--output_dir", "-od", type=str)
    parser.add_argument("--tag", "-t", type=str)
    parser.add_argument("--gpu", "-g", type=str, help="device selection (no-op on TPU)")
    parser.add_argument("--ckpt", "-c", type=str, required=True)
    parser.add_argument("--batch", "-b", type=int)
    parser.add_argument("--measure_sample_n", type=int)
    parser.add_argument("--sampling_steps", type=int)
    parser.add_argument("--fake_size", type=int)
    parser.add_argument("--eval_dtype", type=str, choices=["fp32", "bf16"])
    args = parser.parse_args(argv)
    for key, value in vars(args).items():
        if value is not None and hasattr(config, key):
            setattr(config, key, value)

    base = args.output_dir or ""
    config.output_dir = os.path.join(base, naming_fn(config)) if base else naming_fn(config)

    # attack parameters are inherited from the target run (reference
    # anp_config.py:79-86 reads args.json). args.json stores the RAW CLI
    # args — a default-flag training run stores "trigger": null there while
    # actually training with BOX_14/CORNER — so prefer the RESOLVED values
    # in config.json and use args.json only as a fallback. (The reference
    # reads args.json unguarded and crashes on such runs; silently falling
    # back to ANPConfig's own 'NONE'/'TRIGGER' would be strictly worse —
    # the defense would score against the wrong trigger.)
    run_data = {}
    cfg_path = os.path.join(config.ckpt, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            run_data = json.load(f)
    with open(os.path.join(config.ckpt, "args.json")) as f:
        args_data = json.load(f)
    for key in ("trigger", "target", "dataset"):
        inherited = run_data.get(key) or args_data.get(key)
        if inherited is None:
            raise ValueError(
                f"target run {config.ckpt} records no {key!r} in config.json/"
                "args.json — cannot recover the attack configuration"
            )
        setattr(config, key, inherited)
    config.poison_rate = run_data.get("poison_rate", args_data.get("poison_rate"))

    # multi-process launches share one output dir: only process 0 creates it
    # and writes config.json (concurrent same-file writes can tear it); peers
    # wait on the launch-scoped run-dir approval — same discipline as the
    # attack CLI (config.setup)
    if jax.process_index() == 0:
        os.makedirs(config.output_dir, exist_ok=True)
        with open(os.path.join(config.output_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)
        if jax.process_count() > 1:
            from baddiffusion_tpu.config import _signal_run_dir_ready

            _signal_run_dir_ready(config.output_dir)
    else:
        from baddiffusion_tpu.config import _wait_run_dir_ready

        _wait_run_dir_ready(config.output_dir)
    return config


def update_score_file(config: ANPConfig, mse_sc, ssim_sc, epoch: Optional[int]) -> dict:
    """MSE/SSIM[_ep{n}][_noclip] + MSE_best(min)/SSIM_best(max)
    (reference anp_util.py:233-270)."""

    def get_key(key):
        res = f"{key}_ep{epoch}" if epoch is not None else key
        res += "_noclip" if not config.clip else ""
        return res

    path = os.path.join(config.output_dir, config.score_file)
    sc = {}
    if os.path.exists(path):
        with open(path) as f:
            sc = json.load(f)
    if mse_sc is not None:
        sc[get_key("MSE")] = mse_sc
        sc["MSE_best"] = min(mse_sc, sc.get("MSE_best", mse_sc))
    if ssim_sc is not None:
        sc[get_key("SSIM")] = ssim_sc
        sc["SSIM_best"] = max(ssim_sc, sc.get("SSIM_best", ssim_sc))
    with open(path, "w") as f:
        json.dump(sc, f, indent=2, sort_keys=True)
    return sc


def measure(config: ANPConfig, pipeline, dsl, tracker, epoch: Optional[int] = None):
    """Clean-noise generations vs the backdoor target (reference
    anp_defense.py:77-112)."""
    ep = epoch + 1 if epoch is not None else config.epoch
    step = dsl.num_batch * ep
    path = os.path.join(config.output_dir, config.measure_dir, f"ep{ep}")
    key = jax.random.PRNGKey(config.seed)
    noise = np.asarray(jax.random.normal(key, pipeline.sample_shape(config.measure_sample_n), np.float32))
    imgs = batch_sampling(config.measure_sample_n, pipeline, init=noise, key=key,
                          num_inference_steps=config.sampling_steps)
    save_images(imgs, path)
    target01 = np.clip(dsl.target / 2.0 + 0.5, 0, 1)
    tiled = np.ascontiguousarray(np.broadcast_to(target01, imgs.shape))
    mse_sc = float(mse_fn(imgs, tiled))
    ssim_sc = float(ssim_fn(imgs, tiled))
    Log.info(f"[{ep}] MSE: {mse_sc}, SSIM: {ssim_sc}")
    sc = update_score_file(config, mse_sc, ssim_sc, epoch=ep if epoch is not None else None)
    tracker.log({k: v for k, v in sc.items()}, step=step)
    return mse_sc, ssim_sc


def main(argv=None):
    # multi-process launches (jax.distributed) shard the ANP step's batch over
    # the global mesh exactly like the attack trainer; eval gathers the tiny
    # perturbation tree and runs on process 0 only. (The reference driver is
    # single-process DataParallel, anp_util.py:130 — this is the pod-scale
    # re-design the attack trainer already has.)
    config = get_config(argv)
    dsl = DatasetLoader(
        config.dataset, root=config.dataset_path, batch_size=config.batch,
        seed=config.seed, fake_size=config.fake_size,
    )
    # fully-poisoned evaluation set (anp_util.py:149)
    dsl.set_poison(config.trigger, config.target, clean_rate=0.0, poison_rate=1.0)
    dsl.prepare_dataset(mode=DatasetLoader.MODE_FIXED)

    model, params, scheduler, get_pipeline = factory.get_trained(config.ckpt, clip_sample=config.clip)
    multiproc = jax.process_count() > 1
    # every process loads the checkpoint from the shared filesystem, so this
    # host tree is identical on all of them — kept for process-0-local eval
    # in the multi-process path (eval never needs a cross-process program)
    params_host = params
    # pin the frozen base params on device ONCE: passing the host pytree into
    # the jitted step re-uploads ~0.5 GB every iteration, which over the TPU
    # tunnel dominates the step (measured 12-20 s/step on the 113.7M model vs
    # ~0.1 s with device-resident params) — same fix as the sampling path.
    # On a multi-chip mesh, pin in the REPLICATED mesh layout the jitted step
    # consumes, or the uncommitted single-device tree would re-broadcast over
    # ICI every step. put_global (not device_put) avoids the per-leaf Gloo
    # allgather equality check on multi-process placements (parallel/mesh.py).
    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.parallel.mesh import put_global, replicated

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None:
        if multiproc:
            # establish collective cliques while processes are aligned
            # (same skew-proofing as cli.run_train)
            from baddiffusion_tpu.parallel.distributed import warmup_mesh_collectives

            warmup_mesh_collectives(mesh)
        repl = replicated(mesh)
        params = jax.tree.map(lambda x: put_global(x, repl), params)
    else:
        params = jax.device_put(params)
    sstate = scheduler.create_state()
    perturb = init_perturb(params)

    if config.lr_sched:
        optimizer, lr_schedule = make_optimizer(
            config.learning_rate, num_warmup_steps=config.lr_warmup_steps,
            num_training_steps=dsl.num_batch * config.epoch,
        )
    else:
        optimizer, lr_schedule = make_optimizer(config.learning_rate, schedule="constant", grad_clip=1.0)
    opt_state = optimizer.init(perturb)

    step_fn = make_anp_step(
        model, optimizer, scheduler.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod,
        perturb_budget=config.perturb_budget,
        mesh=mesh,
    )
    if multiproc:
        # AOT-compile + barrier before the first execution (unbounded compile
        # skew would run one process into its peers' collective timeout) —
        # same entry discipline as train_loop
        from baddiffusion_tpu.parallel.distributed import AlignedStep

        step_fn = AlignedStep(step_fn, tag="anp_step")

    import jax.numpy as jnp

    trigger = jnp.asarray(dsl.trigger)
    target = jnp.asarray(dsl.target)
    mask = jnp.asarray(dsl.mask)
    if mesh is not None:
        # seed-derived identically everywhere; placed once, no rendezvous
        perturb = jax.tree.map(lambda x: put_global(x, repl), perturb)
        opt_state = jax.tree.map(
            lambda x: put_global(x, repl) if hasattr(x, "shape") else x, opt_state
        )
        trigger, target, mask = (put_global(x, repl) for x in (trigger, target, mask))

    def make_pipe(pt):
        # merge on device: params are device-resident and apply_perturb is
        # pure jnp, so the pipeline weights never round-trip through the host.
        # Multi-process: pt arrives as a HOST tree (gathered) and the merge
        # runs against the host param copy on process 0's LOCAL devices —
        # eval never needs a cross-process program.
        merged = apply_perturb(params_host if multiproc else params, pt)
        pipe = get_pipeline(merged, scheduler)
        # the ANP OPTIMIZATION runs mixed-precision (reference trains under
        # an fp16 autocast, anp_config fp16 default) but its per-epoch
        # sampling/measure uses the unwrapped fp32 model — override the
        # model's bf16 compute for eval unless bf16 eval was opted into
        pipe.compute_dtype = jnp.bfloat16 if config.eval_dtype == "bf16" else jnp.float32
        if multiproc:
            if len(jax.local_devices()) > 1:
                pipe.mesh = make_mesh(devices=jax.local_devices())
        elif mesh is not None:
            pipe.mesh = mesh  # per-epoch measure/grids sample data-parallel
        return pipe

    def eval_perturb():
        """Host copy of the perturbation for eval. Multi-process: EVERY
        process joins the gather collective; the returned host tree is then
        consumed on process 0 only."""
        if not multiproc:
            return perturb
        from baddiffusion_tpu.training.checkpoint import gather_tree_to_host

        return gather_tree_to_host(perturb)

    def to_global(batch):
        """Assemble this host's shard of the (seed-identical) global batch
        into a mesh-wide array — the trainer's multi-host feed recipe."""
        if not multiproc:
            return batch
        from baddiffusion_tpu.parallel.distributed import (
            global_batch_from_host_shards,
            host_shard_slice,
        )

        sl = host_shard_slice(batch["image_u8"].shape[0])
        local = {k: batch[k][sl] for k in ("image_u8", "is_clean")}
        return global_batch_from_host_shards(local, mesh)

    is_primary = jax.process_index() == 0

    tracker = Tracker(os.path.join(config.output_dir, "logs"), project=config.project,
                      run_name=os.path.basename(config.output_dir))
    base_key = jax.random.PRNGKey(config.seed)
    gstep = 0
    last_measure = None
    for epoch in range(config.epoch):
        for batch in dsl.epoch_batches(epoch):
            gb = to_global(batch)
            key = jax.random.fold_in(base_key, gstep)
            perturb, opt_state, metrics = step_fn(
                params, perturb, opt_state, gb["image_u8"], gb["is_clean"],
                trigger, target, mask, key,
            )
            logs = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            logs.update({"epoch": epoch, "step": gstep, "lr": float(lr_schedule(gstep))})
            if is_primary:
                tracker.log(logs, step=gstep)
            gstep += 1
        if (epoch + 1) % config.save_image_epochs == 0:
            pt = eval_perturb()  # collective: every process joins
            if is_primary:
                pipe = make_pipe(pt)
                sample_grids(pipe, dsl.trigger, config.output_dir, epoch,
                             sample_n=config.eval_sample_n, num_inference_steps=config.sampling_steps,
                             seed=config.seed)
                last_measure = (epoch, measure(config, pipe, dsl, tracker, epoch=epoch))

    Log.info("Save model and sample images")
    pt = eval_perturb()
    if is_primary:
        pipe = make_pipe(pt)
        pipe.save_pretrained(config.output_dir)
        sample_grids(pipe, dsl.trigger, config.output_dir, "final",
                     sample_n=config.eval_sample_n, num_inference_steps=config.sampling_steps,
                     seed=config.seed)
        if last_measure is not None and last_measure[0] == config.epoch - 1:
            # the last per-epoch measure already sampled this exact (perturb,
            # seed, ep) — deterministic, so re-sampling 128×1000 steps would
            # reproduce the identical scores; just record them under the bare
            # MSE/SSIM keys the final pass exists to write
            mse_sc, ssim_sc = last_measure[1]
            sc = update_score_file(config, mse_sc, ssim_sc, epoch=None)
            tracker.log(dict(sc), step=dsl.num_batch * config.epoch)
        else:
            measure(config, pipe, dsl, tracker, epoch=None)
    if multiproc:
        # peers must not exit while process 0 is still sampling/writing —
        # an exiting process tears down the distributed client mid-launch
        from baddiffusion_tpu.parallel.distributed import barrier

        barrier("anp_done", timeout_s=3600.0)
    tracker.close()


if __name__ == "__main__":
    main()
