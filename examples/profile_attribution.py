"""Per-op time/HBM attribution for the 32px hot paths (VERDICT r4 #1).

Runs the exact bench.py 32px train step (and optionally the 1000-step
sampler) under the device profiler and prints the leaf fusions ranked by
device time, with their HBM bytes and FLOPs — the map of where the step's
33 ms actually goes, so conv-mapping levers can be aimed instead of guessed.

Usage:
    python examples/profile_attribution.py train    # 32px train step
    python examples/profile_attribution.py sample   # 1000-step sampler
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_train_step():
    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    BATCH = 128
    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=32)
    model = UNet2DModel(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(2e-4, num_warmup_steps=500, num_training_steps=10_000)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=32, batch_size=BATCH, fake_size=BATCH * 2)
    dsl.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(
        model, optimizer, sched.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod, use_remat=False,
    )
    batch = next(dsl.epoch_batches(0))
    img = jax.device_put(batch["image_u8"])
    clean = jax.device_put(batch["is_clean"])
    holder = {"state": state}

    def run_once():
        holder["state"], m = step(holder["state"], img, clean, jax.random.PRNGKey(7))
        jax.block_until_ready(m["loss"])

    return run_once


def build_sampler():
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.pipelines import DiffusionPipeline
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler

    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=32)
    model = UNet2DModel(cfg, dtype=jnp.float32)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    pipe = DiffusionPipeline(model, jax.device_get(params), sched, compute_dtype=jnp.bfloat16)
    init = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (128, 32, 32, 3), jnp.float32))
    pipe(init=init, num_inference_steps=1000, key=jax.random.PRNGKey(8))  # compile

    def run_once():
        pipe(init=init, num_inference_steps=1000, key=jax.random.PRNGKey(9))

    return run_once


def main():
    from baddiffusion_tpu.utils.profiling import hbm_top_ops, measure_hbm_traffic

    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    run_once = build_train_step() if which == "train" else build_sampler()
    run_once()  # warm
    steps = 4 if which == "train" else 1
    stats = measure_hbm_traffic(run_once, steps=steps)
    print(f"== {which}: {stats['device_time_ms_per_step']:.2f} ms device/step, "
          f"{stats['hbm_gib_per_step']:.2f} GiB/step, "
          f"{stats['measured_flops_per_step']/1e9:.1f} measured GFLOP/step ==")
    rows = hbm_top_ops(stats["trace_dir"], k=4096)
    rows.sort(key=lambda r: -r[2])  # by device time
    total_t = sum(r[2] for r in rows) or 1.0
    print(f"{'time%':>6} {'t_ms':>8} {'GiB':>7} {'TFLOP/s':>8}  op")
    shown = 0.0
    for name, b, t_ps, fl in rows[:40]:
        t_ms = t_ps / 1e9 / steps
        pct = t_ps / total_t * 100
        shown += pct
        eff = (fl / (t_ps / 1e12) / 1e12) if t_ps else 0.0
        print(f"{pct:6.2f} {t_ms:8.3f} {b/steps/2**30:7.3f} {eff:8.1f}  {name[:110]}")
    print(f"(top-40 = {shown:.1f}% of device time; {len(rows)} leaf ops total)")


if __name__ == "__main__":
    main()
