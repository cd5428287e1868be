"""The driver CLI: train / resume / sampling / measure / train+measure.

Behavioral contract: reference `baddiffusion.py` main dispatch (:651-679) and
the mode bodies — train_loop (:572-645), sampling (:366-419), measure
(:477-551) with `score.json` merging (:428-450). Run with

  python -m baddiffusion_tpu.cli --mode train --dataset CIFAR10 --batch 128 ...

(same flag surface; see config.py for the mode/allow-list semantics).
"""

from __future__ import annotations

import json
import os
from typing import Optional  # noqa: E402  (jax config must precede factory import)

import jax
import numpy as np

# persistent XLA compile cache: the 1000-step sampling scans dominate cold
# start otherwise (override dir via JAX_COMPILATION_CACHE_DIR)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from baddiffusion_tpu import factory
from baddiffusion_tpu.config import (
    MODE_MEASURE,
    MODE_RESUME,
    MODE_SAMPLING,
    MODE_TRAIN,
    MODE_TRAIN_MEASURE,
    TrainingConfig,
    setup,
)
from baddiffusion_tpu.data import DatasetLoader
from baddiffusion_tpu.metrics import fid as fid_fn
from baddiffusion_tpu.metrics import mse as mse_fn
from baddiffusion_tpu.metrics import ssim as ssim_fn
from baddiffusion_tpu.pipelines import batch_sampling_save
from baddiffusion_tpu.training import (
    create_train_state,
    has_trainer_state,
    load_trainer_state,
    make_optimizer,
    make_train_step,
    sample_grids,
    train_loop,
)
from baddiffusion_tpu.training.checkpoint import ep_model_path
from baddiffusion_tpu.utils.image import load_image_dir, save_images
from baddiffusion_tpu.utils.logging import Log
from baddiffusion_tpu.utils.trackers import Tracker


def get_data_loader(config: TrainingConfig) -> DatasetLoader:
    # the loader yields GLOBAL batches (reference global batch = --batch ×
    # grad_accum, reached by accumulating loader batches; here the train step
    # scans over --batch-sized micro-batches inside, so the loader must hand
    # it the full global batch for identical training dynamics)
    global_batch = config.batch * config.gradient_accumulation_steps
    dsl = DatasetLoader(
        config.dataset,
        root=config.dataset_path,
        batch_size=global_batch,
        seed=config.seed,
        fake_size=config.fake_size,
        image_size=config.image_size,
    )
    dsl.set_poison(
        trigger_type=config.trigger,
        target_type=config.target,
        clean_rate=config.clean_rate,
        poison_rate=config.poison_rate,
    ).prepare_dataset(mode=config.dataset_load_mode, split_method=config.split_method)
    return dsl


def init_model(config: TrainingConfig, dsl: DatasetLoader):
    """(model, params, scheduler, get_pipeline) for the configured ckpt."""
    import jax.numpy as jnp

    dtype = jnp.float32 if config.mixed_precision == "no" else jnp.bfloat16
    if config.ckpt is None:
        return factory.get_model_sched(
            image_size=dsl.image_size,
            channels=dsl.channel,
            noise_sched_type=config.sched,
            clip_sample=config.clip,
            rng_seed=config.seed,
            dtype=dtype,
        )
    return factory.get_pretrained(
        config.ckpt, clip_sample=config.clip, noise_sched_type=config.sched, dtype=dtype
    )


def run_train(config: TrainingConfig, resume: bool = False):
    """Returns the DatasetLoader so train+measure reuses it instead of
    re-decoding/poison-splitting the whole dataset a second time."""
    dsl = get_data_loader(config)
    if dsl.image_size >= 256 and 1 <= config.batch < 8:
        # the reference README's 256px `--batch 4` is a GPU-memory artifact;
        # on TPU that micro-batch explodes per-conv layout/copy traffic
        # (measured 1462 vs 386 GiB/step) and runs the SAME global batch ~3x
        # slower than --batch 8 (docs/DESIGN.md "Measured performance")
        Log.warning(
            f"TPU perf: micro-batch {config.batch} at {dsl.image_size}px runs "
            "~3x slower than --batch 8 for the identical global batch; "
            "see docs/DESIGN.md"
        )
    model, params, scheduler, get_pipeline = init_model(config, dsl)
    sstate = scheduler.create_state()

    # LR schedule time constants: the reference steps its schedule once per
    # MICRO-batch (baddiffusion.py:614 under accumulate) with warmup 500 and
    # total len(loader)·epochs; here the schedule advances once per OPTIMIZER
    # step, so both constants scale by 1/grad_accum to trace the same curve
    # in sample time.
    accum = max(1, config.gradient_accumulation_steps)
    steps_per_epoch = dsl.num_batch  # optimizer steps (loader yields global batches)
    optimizer, lr_schedule = make_optimizer(
        config.learning_rate,
        num_warmup_steps=max(1, config.lr_warmup_steps // accum),
        num_training_steps=max(1, config.epoch * steps_per_epoch),
    )
    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)

    # mesh over every visible chip (the reference's --gpu DataParallel analog,
    # but as one SPMD program; single chip → no mesh). --model_parallel m
    # builds a 2-D (data=N/m, model=m) mesh; --param_sharding fsdp composes
    # on the same mesh's data axis (sharding_rules.train_state_specs).
    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_dev = len(jax.devices())
    mp = max(1, config.model_parallel)
    mesh = None
    state_shardings = None
    if n_dev > 1:
        if mp > 1:
            if n_dev % mp:
                raise ValueError(f"--model_parallel {mp} does not divide {n_dev} devices")
            mesh = make_mesh(shape=(n_dev // mp, mp), axis_names=(DATA_AXIS, MODEL_AXIS))
            Log.info(f"2-D mesh: data={n_dev // mp} × model={mp}")
        else:
            mesh = make_mesh()
            Log.info(f"data-parallel mesh over {n_dev} devices")
        # establish the per-axis collective cliques NOW, while processes are
        # aligned — the first subgroup collective inside a compiled step
        # would otherwise rendezvous under arbitrary compile skew
        # (parallel/distributed.py:warmup_mesh_collectives)
        from baddiffusion_tpu.parallel.distributed import warmup_mesh_collectives

        warmup_mesh_collectives(mesh)
        # place the full TrainState into its composed layout (replicated /
        # TP / FSDP / TP+FSDP) and pin the SAME layout on both sides of the
        # jitted step — layout-stable: one program for every step, bitwise-
        # reproducible across resume (GSPMD inserts the collectives). One
        # sharding tree is the single source of truth for both placement
        # and pinning.
        from baddiffusion_tpu.parallel import train_state_shardings
        from baddiffusion_tpu.parallel.mesh import put_global

        state_shardings = train_state_shardings(state, optimizer, mesh, config.param_sharding)
        state = jax.tree.map(put_global, state, state_shardings)
        if config.param_sharding == "fsdp":
            Log.info("FSDP parameter layout (params + optimizer sharded over data axis)")

    start_epoch = start_step = 0
    if resume and has_trainer_state(config.output_dir):
        # the placed state is the restore template: arrays land directly in
        # the live sharding layout — multi-process-safe (no host gather)
        state, start_epoch, start_step = load_trainer_state(config.output_dir, state)
        Log.info(f"resumed from epoch {start_epoch}, step {start_step}")

    data_size = mesh.shape[DATA_AXIS] if mesh is not None else 1
    train_step = make_train_step(
        model,
        optimizer,
        scheduler.config.num_train_timesteps,
        sstate.schedule.alphas,
        sstate.schedule.alphas_cumprod,
        grad_accum=config.gradient_accumulation_steps,
        mesh=mesh,
        state_shardings=state_shardings,
        # remat only where activations would actually exceed HBM: measured on
        # v5e (16 GiB), the 256px no-remat step fits through PER-CHIP
        # micro-batch 16 (<=10 GiB temp) and is +28% faster at the canonical
        # micro-batch 4 (2804 vs 3603 ms per global-64 step;
        # examples/mfu_analysis.py). On a data mesh each chip sees
        # batch/data_size rows, so the auto condition uses that. Calibrated
        # on a 16 GiB v5e — on smaller-HBM parts use --remat on if
        # compilation OOMs.
        # Selective remat (jax.checkpoint policy saving conv/dot outputs,
        # recomputing elementwise) was measured and REJECTED: at 32px/128 it
        # moves MORE bytes than no-remat (32.1 vs 25.9 GiB/step, 3727 vs
        # 3868 samples/s) because XLA's default scheduling already
        # rematerializes the cheap chains it would save; and at 256px/32 even
        # full remat OOMs single-chip, so micro-batch<=16 (grad accum) is the
        # real constraint there. Both headline steps sit at ~104-110% of the
        # logical HBM roofline — binary on/off is the whole tuning space.
        use_remat={"on": True, "off": False}.get(
            config.remat, dsl.image_size >= 256 and -(-config.batch // data_size) > 16
        ),
    )

    def make_pipeline(st):
        # params stay on device; device_get here would force a host round trip
        # and a re-upload on every pipeline call
        pipe = get_pipeline(st.params, scheduler)
        if mesh is not None and jax.process_count() == 1:
            # single-process multi-chip: in-training sample grids shard their
            # batch over the same mesh (ensure_on_device reshards FSDP/TP
            # params to the replicated layout once per pipeline). Multi-
            # process keeps the gather-then-process-0 path in train_loop.
            pipe.mesh = mesh
        if config.sample_segment:
            pipe.segment_steps = config.sample_segment
        return pipe

    tracker = Tracker(
        os.path.join(config.output_dir, "logs"),
        project=config.project,
        run_name=os.path.basename(config.output_dir),
        config=vars(config),
    )
    try:
        state, _ = train_loop(
            dsl=dsl,
            train_step=train_step,
            state=state,
            lr_schedule=lr_schedule,
            epochs=config.epoch,
            tracker=tracker,
            out_dir=config.output_dir,
            make_pipeline=make_pipeline,
            seed=config.seed,
            start_epoch=start_epoch,
            start_step=start_step,
            save_image_epochs=config.save_image_epochs,
            save_model_epochs=config.save_model_epochs,
            sample_n=config.eval_sample_n,
            sampling_steps=config.sampling_steps,
            save_all_model_epochs=config.is_save_all_model_epochs,
            capture_every=config.capture_every,
            profile_steps=config.profile_steps,
            mesh=mesh,
            async_ckpt=config.async_ckpt,
        )
    finally:
        tracker.close()
    return dsl


def load_pipeline_for_eval(config: TrainingConfig):
    """Pipeline from the run dir (or a per-epoch snapshot via --sample_ep).

    Evaluation runs the UNet in f32 — the reference samples/measures with the
    unwrapped fp32 model even when training is mixed-precision
    (SURVEY.md §8.6)."""
    import jax.numpy as jnp

    path = config.output_dir
    if config.sample_ep is not None:
        path = ep_model_path(config.output_dir, config.sample_ep)
    _model, params, scheduler, get_pipeline = factory.get_trained(
        path, clip_sample=config.clip, noise_sched_type=config.sched, dtype=jnp.float32
    )
    pipeline = get_pipeline(params, scheduler)
    if config.eval_dtype == "bf16":
        pipeline.compute_dtype = jnp.bfloat16  # opt-in throughput mode (--eval_dtype bf16)
    if config.sample_segment:
        # bounded-length sampling programs (--sample_segment): identical math
        pipeline.segment_steps = config.sample_segment
    if len(jax.local_devices()) > 1:
        # data-parallel sampling over every local chip: the 2048-image measure
        # shards its batch instead of serializing on one device (samples are
        # independent, so results match single-device sampling; tested on the
        # virtual 8-device mesh)
        from baddiffusion_tpu.parallel import make_mesh

        pipeline.mesh = make_mesh(devices=jax.local_devices())
        Log.info(f"eval sampling sharded over {len(jax.local_devices())} local devices")
    return pipeline


def _eval_is_primary() -> bool:
    """Gate for the small qualitative-sampling path (16 grid images): in a
    multi-process launch every process would redo the SAME work and race on
    the output files, so only process 0 runs it (train_loop applies the same
    discipline one level down for its in-training sampling/export). The
    2048-sample measure does NOT use this gate — it shards sampling across
    processes (see run_measure)."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        Log.info(f"process {jax.process_index()}: eval runs on process 0 only, skipping")
        return False
    return True


def run_sampling(config: TrainingConfig, dsl: Optional[DatasetLoader] = None) -> None:
    if not _eval_is_primary():
        return
    dsl = dsl or get_data_loader(config)
    pipeline = load_pipeline_for_eval(config)
    tag = f"{config.sample_ep}" if config.sample_ep is not None else "final"
    tag += "" if config.clip else "_noclip"
    steps = config.sampling_steps or pipeline.default_inference_steps
    sample_grids(
        pipeline,
        dsl.trigger,
        config.output_dir,
        tag,
        sample_n=config.eval_sample_n,
        num_inference_steps=steps,
        seed=config.seed,
        capture_every=config.capture_every,
    )
    Log.info(f"sampling written under {config.output_dir}/(samples|backdoor_samples)")


def update_score_file(config: TrainingConfig, score_file: str, fid_sc, mse_sc, ssim_sc, fid_key: str = "FID") -> dict:
    """Merge scores under FID/MSE/SSIM[_ep{n}][_noclip] keys
    (reference baddiffusion.py:428-450). ``fid_key`` is ``FID_proxy`` when the
    extractor is the offline proxy — proxy scores are NOT comparable with
    pytorch-fid numbers and must never occupy the bare ``FID`` key."""

    def get_key(key: str) -> str:
        res = f"{key}_ep{config.sample_ep}" if config.sample_ep is not None else key
        res += "_noclip" if not config.clip else ""
        return res

    path = os.path.join(config.output_dir, score_file)
    sc = {}
    if os.path.exists(path):
        with open(path) as f:
            sc = json.load(f)
    for key, val in ((fid_key, fid_sc), ("MSE", mse_sc), ("SSIM", ssim_sc)):
        k = get_key(key)
        sc[k] = val if val is not None else sc.get(k)
    with open(path, "w") as f:
        json.dump(sc, f, indent=2, sort_keys=True)
    return sc


def run_measure(config: TrainingConfig, dsl: Optional[DatasetLoader] = None, resample: bool = True, recomp: bool = True) -> None:
    """FID (clean gen vs real) + MSE/SSIM (backdoor gen vs tiled target)
    (reference measure(), baddiffusion.py:477-551).

    Multi-process launches shard the 2048-sample generation across processes
    (each samples its round-robin share of the eval chunks on its own local
    devices — global chunk indices key both the PRNG and the PNG names, so
    the assembled directory is byte-identical to a single-process run), then
    barrier; process 0 alone computes the metrics and writes score.json.
    Assumes the run dir is on a filesystem shared by all processes — the same
    contract the multi-process checkpoint already requires."""
    dsl = dsl or get_data_loader(config)
    pipeline = load_pipeline_for_eval(config)
    shard_index, shard_count = jax.process_index(), jax.process_count()

    # folders (reference :492-500); the real-image dump is cwd-relative
    dataset_img_dir = os.path.join("measure", config.dataset)
    folder_parts = [config.output_dir, "measure"]
    if config.sample_ep is not None:
        folder_parts.append(f"ep{config.sample_ep}")
    suffix = "" if config.clip else "_noclip"
    clean_path = os.path.join(*folder_parts, "clean" + suffix)
    backdoor_path = os.path.join(*folder_parts, "backdoor" + suffix)

    recomp_clean = recomp_backdoor = recomp
    if shard_index == 0 and not os.path.isdir(dataset_img_dir):
        # membership matches the reference's ds.shuffle(seed)[:n] dump
        # (baddiffusion.py:489,503-508) — see DatasetLoader.real_image_sample
        imgs01 = dsl.real_image_sample(config.measure_sample_n).astype(np.float32) / 255.0
        save_images(imgs01, dataset_img_dir)
        recomp_clean = True

    key = jax.random.PRNGKey(config.seed)
    shape = pipeline.sample_shape(config.measure_sample_n)
    noise = np.asarray(jax.random.normal(key, shape, dtype=np.float32))
    backdoor_noise = noise + dsl.trigger[None]

    # the reuse decisions are snapshotted BEFORE any process starts sampling
    # (and a barrier separates snapshot from sampling on a pod) — otherwise a
    # slow process could observe a dir a fast process just created mid-run and
    # skip its shard, leaving the branch silently incomplete
    need_clean = resample or not os.path.isdir(clean_path)
    need_backdoor = resample or not os.path.isdir(backdoor_path)
    if shard_count > 1:
        from baddiffusion_tpu.parallel.distributed import barrier

        barrier("measure_planned")

    steps_kw = {} if config.measure_steps is None else {"num_inference_steps": config.measure_steps}
    shard_kw = {"shard_index": shard_index, "shard_count": shard_count}
    if need_clean:
        batch_sampling_save(config.measure_sample_n, pipeline, clean_path, init=noise,
                            max_batch_n=config.eval_max_batch, key=key, **shard_kw, **steps_kw)
        recomp_clean = True
    if need_backdoor:
        batch_sampling_save(config.measure_sample_n, pipeline, backdoor_path, init=backdoor_noise,
                            max_batch_n=config.eval_max_batch, key=key, **shard_kw, **steps_kw)
        recomp_backdoor = True

    if shard_count > 1:
        # all shards' PNGs must be on disk before process 0 scores the dirs.
        # The timeout must cover cross-process COMPILE skew on the sampling
        # program (one process hitting the persistent cache while a peer
        # cold-compiles the 1000-step scan — observed >9 min at 256px), not
        # just the sampling-time imbalance, so it sits far above barrier()'s
        # generic 600 s.
        from baddiffusion_tpu.parallel.distributed import barrier

        barrier("measure_sampled", timeout_s=3600.0)
        if shard_index != 0:
            Log.info(f"process {shard_index}: sampling shard done; metrics run on process 0")
            return

    fid_sc = mse_sc = ssim_sc = None
    if recomp_clean:
        fid_sc = float(fid_fn([dataset_img_dir, clean_path]))
    if recomp_backdoor:
        gen = load_image_dir(backdoor_path)
        target01 = np.clip(dsl.target / 2.0 + 0.5, 0, 1)
        tiled = np.broadcast_to(target01, gen.shape)
        mse_sc = float(mse_fn(gen, tiled))
        ssim_sc = float(ssim_fn(gen, np.ascontiguousarray(tiled)))
    Log.info(f"[{config.sample_ep}] FID: {fid_sc}, MSE: {mse_sc}, SSIM: {ssim_sc}")

    from baddiffusion_tpu.metrics.fid import using_real_weights

    fid_key = "FID" if using_real_weights() else "FID_proxy"
    sc = update_score_file(config, "score.json", fid_sc, mse_sc, ssim_sc, fid_key=fid_key)
    tracker = Tracker(os.path.join(config.output_dir, "logs"), project=config.project)
    # the reference logs MICRO-steps (baddiffusion.py:452-475: epochs × micro-
    # batches); the loader here yields GLOBAL batches, so scale by grad-accum
    epochs_done = config.sample_ep + 1 if config.sample_ep is not None else config.epoch
    step = dsl.num_batch * max(1, config.gradient_accumulation_steps) * epochs_done
    tracker.log({k: v for k, v in sc.items() if v is not None}, step=step)
    tracker.close()


def main(argv=None):
    config = setup(argv)
    if config.mode in (MODE_TRAIN, MODE_RESUME, MODE_TRAIN_MEASURE):
        dsl = run_train(config, resume=config.mode == MODE_RESUME)
        if config.mode == MODE_TRAIN_MEASURE:
            run_measure(config, dsl=dsl)
    elif config.mode == MODE_SAMPLING:
        run_sampling(config)
    elif config.mode == MODE_MEASURE:
        run_measure(config)
    else:
        raise NotImplementedError(config.mode)


if __name__ == "__main__":
    main()
