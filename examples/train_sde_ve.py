"""Train a matched VE score model and run SDE-VE on-distribution (VERDICT r4 #5).

The SDE-VE predictor-corrector engine (pipelines/sampler.sde_ve_segment,
reference scheduling_sde_ve.py:120-260) has CPU-tier parity evidence, but its
only prior hardware row drove a DDPM-trained epsilon model — off-distribution
by construction (SWEEP.json FID_proxy 850, documented expected; the reference
itself crashes on `--sched SCORE-SDE-VE-SCHED`, SURVEY.md §8.9). This script
closes that: train a small sigma-conditioned score model under the VE SDE
(training/score_matching.py) on the staged dataset, run the full 2000-step
PC sampler, and record a matched-model row in SWEEP.json.

CIFAR-scale sigma ladder: sigma_max=50 (the NCSN++ cifar10 setting; the
1348 default in ScoreSdeVeConfig is the 256px celebahq ladder).

Run:  python examples/train_sde_ve.py [--steps 4000] [--n 256] \
          [--out /tmp/sde_ve_run] [--sweep SWEEP.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SCORE_MODEL_CONFIG = dict(
    sample_size=32,
    time_embedding_type="fourier",  # NCSN++ conditioning: fourier(log sigma)
    block_out_channels=(128, 128, 256),
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--sigma_max", type=float, default=50.0)
    p.add_argument("--n", type=int, default=256, help="samples for the FID_proxy row")
    p.add_argument("--sample_segment", type=int, default=500)
    p.add_argument("--out", default="/tmp/sde_ve_run")
    p.add_argument("--sweep", default="SWEEP.json")
    p.add_argument("--dataset", default="CIFAR10")
    args = p.parse_args()

    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.metrics.fid import fid as fid_fn
    from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
    from baddiffusion_tpu.pipelines import DiffusionPipeline
    from baddiffusion_tpu.schedulers import ScoreSdeVeConfig, ScoreSdeVeScheduler
    from baddiffusion_tpu.training import (
        create_score_train_state,
        make_optimizer,
        make_ve_train_step,
    )
    from baddiffusion_tpu.utils.image import save_image_grid, save_images

    # data: the staged procedural hub-schema dataset if present, FAKE otherwise
    try:
        dsl = DatasetLoader(args.dataset, image_size=32, batch_size=args.batch)
        dsl.set_poison("NONE", "TRIGGER", poison_rate=0.0).prepare_dataset()
    except Exception:
        dsl = DatasetLoader(DatasetLoader.FAKE, image_size=32, batch_size=args.batch, fake_size=4096)
        dsl.set_poison("NONE", "TRIGGER", poison_rate=0.0).prepare_dataset()

    sched = ScoreSdeVeScheduler(ScoreSdeVeConfig(sigma_max=args.sigma_max))
    sstate = sched.create_state()

    model = UNet2DModel(UNet2DConfig(**SCORE_MODEL_CONFIG), dtype=jnp.bfloat16)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    optimizer, _ = make_optimizer(
        args.lr, num_warmup_steps=500, num_training_steps=args.steps
    )
    state = create_score_train_state(params, optimizer)
    step = make_ve_train_step(model, optimizer, sstate.discrete_sigmas)

    print(f"[sde-ve] {n_params/1e6:.1f}M-param score model, sigma [{sched.config.sigma_min}, "
          f"{args.sigma_max}], {args.steps} steps @ batch {args.batch}", flush=True)
    t0 = time.time()
    i = 0
    epoch = 0
    while i < args.steps:
        for batch in dsl.epoch_batches(epoch):
            if i >= args.steps:
                break
            state, m = step(state, jax.device_put(batch["image_u8"]), jax.random.PRNGKey(i))
            if i % 250 == 0:
                print(f"[sde-ve] step {i}: loss {float(m['loss']):.4f} "
                      f"({(time.time()-t0):.0f}s)", flush=True)
            i += 1
        epoch += 1
    print(f"[sde-ve] trained {i} steps in {time.time()-t0:.0f}s, "
          f"final loss {float(m['loss']):.4f}", flush=True)

    # fp32 weights for eval; save the HF-layout checkpoint
    params_f32 = jax.device_get(state.params)
    model_eval = UNet2DModel(UNet2DConfig(**SCORE_MODEL_CONFIG), dtype=jnp.float32)
    pipe = DiffusionPipeline(
        model_eval, params_f32, sched,
        default_inference_steps=sched.config.num_train_timesteps,
        hf_class_name="ScoreSdeVePipeline", compute_dtype=jnp.bfloat16,
    )
    pipe.segment_steps = args.sample_segment or None
    os.makedirs(args.out, exist_ok=True)
    pipe.save_pretrained(args.out)

    # reference images for FID_proxy: the training distribution itself
    ref_dir = os.path.join(args.out, "ref_images")
    if not os.path.isdir(ref_dir):
        imgs = []
        for batch in dsl.epoch_batches(0):
            imgs.append(batch["image_u8"])
            if sum(b.shape[0] for b in imgs) >= args.n:
                break
        save_images(np.concatenate(imgs)[: args.n].astype(np.float32) / 255.0, ref_dir)

    # the 2000-step PC chain on hardware
    key = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(key, pipe.sample_shape(args.n), np.float32))
    t0 = time.time()
    out = pipe(init=noise, key=key)
    imgs = np.asarray(out.images)
    wall = time.time() - t0
    samples_dir = os.path.join(args.out, "pc_samples")
    save_images(imgs, samples_dir)
    save_image_grid(imgs[:16], os.path.join(args.out, "pc_grid.png"), 4, 4)
    fid = float(fid_fn([ref_dir, samples_dir]))
    row = {
        "FID_proxy": round(fid, 2),
        "imgs_per_sec": round(args.n / wall, 3),
        "steps": sched.config.num_train_timesteps,
        "measure_sample_n": args.n,
        "note": (
            "matched sigma-conditioned score model trained with VE DSM "
            "(training/score_matching.py) — the on-distribution run; the "
            "SCORE-SDE-VE-SCHED row above drives a DDPM-trained model and is "
            "documented off-distribution"
        ),
        "score_model_params_m": round(n_params / 1e6, 1),
        "train_steps": args.steps,
        "run_dir": args.out,
    }
    table = {}
    if os.path.exists(args.sweep):
        with open(args.sweep) as f:
            table = json.load(f)
    table["SCORE-SDE-VE (matched score model)"] = row
    with open(args.sweep, "w") as f:
        json.dump(table, f, indent=2, sort_keys=True)
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
