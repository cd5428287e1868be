"""Roofline/MFU analysis of the headline train step and sampling forward.

Uses XLA's own cost model (``Compiled.cost_analysis``) on the exact jitted
programs bench.py times, then reports model FLOPs utilization against the
chip's peak (v5e ≈ 197 bf16 TFLOP/s) and HBM bandwidth utilization
(v5e ≈ 819 GB/s). This pins where the measured samples/sec sits relative to
speed-of-light, so perf work targets the true bottleneck.

CAVEAT (round 4): the cost model's "bytes accessed" is LOGICAL pre-fusion
traffic — it over-counts what the chip moves by ~3x on these steps (fusion
eliminates most of it), so >100% "HBM utilization" here is an artifact, not
saturation. The authoritative numbers are the PROFILER-measured fields in
bench.py (``*_hbm_measured_*``, via utils/profiling.measure_hbm_traffic);
see docs/DESIGN.md "Roofline position — measured" for the revised story.

Usage: python examples/mfu_analysis.py [--measure]  (--measure also times it)
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same config as bench.py): the 256px remat variant
# compiles >9 min cold — without the cache this script times out
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def main(measure: bool, image_size: int = 32, batch: int = 128, grad_accum: int = 1,
         remat: bool = False) -> None:
    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    global_batch = batch * grad_accum
    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=image_size)
    model = UNet2DModel(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))

    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(2e-4, num_warmup_steps=500, num_training_steps=10_000)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=image_size, batch_size=global_batch,
                        fake_size=global_batch)
    dsl.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(
        model, optimizer, sched.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod,
        grad_accum=grad_accum, use_remat=remat,
    )

    batch_data = next(dsl.epoch_batches(0))
    img = jnp.asarray(batch_data["image_u8"])
    clean = jnp.asarray(batch_data["is_clean"])
    key = jax.random.PRNGKey(0)

    lowered = jax.jit(step).lower(state, img, clean, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_moved = float(ca.get("bytes accessed", 0.0))
    if grad_accum > 1:
        # XLA's cost model counts the accumulation scan's body once, not
        # x trip-count — scale (slightly over-counts the once-per-step
        # optimizer update, which is small against grad_accum fwd+bwd bodies)
        flops *= grad_accum
        bytes_moved *= grad_accum
    t_compute = flops / V5E_PEAK_BF16_FLOPS
    t_mem = bytes_moved / V5E_HBM_BYTES_PER_S
    print(f"train step ({image_size}px, micro-batch {batch} x accum {grad_accum}"
          f"{', remat' if remat else ''}): {flops/1e9:.1f} GFLOP, {bytes_moved/2**30:.2f} GiB moved")
    print(f"  speed-of-light: compute {t_compute*1e3:.2f} ms, memory {t_mem*1e3:.2f} ms "
          f"-> bound: {'compute' if t_compute > t_mem else 'memory'}")
    sol_sps = global_batch / max(t_compute, t_mem)
    print(f"  SOL samples/sec (max(compute,mem)): {sol_sps:.0f}")

    if measure:
        s = state
        for i in range(3):
            s, m = step(s, img, clean, jax.random.PRNGKey(i))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        n = 30 if image_size <= 64 else 10
        for i in range(n):
            s, m = step(s, img, clean, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / n
        sps = global_batch / dt
        print(f"  measured: {dt*1e3:.2f} ms/step = {sps:.0f} samples/s "
              f"-> MFU {flops/dt/V5E_PEAK_BF16_FLOPS*100:.1f}%, "
              f"HBM util {bytes_moved/dt/V5E_HBM_BYTES_PER_S*100:.1f}%, "
              f"{sps/sol_sps*100:.1f}% of SOL")


def sampling_main(measure: bool, batch: int = 128, steps: int = 1000, eval_dtype: str = "bf16") -> None:
    """Roofline for the 1000-step DDPM sampling scan bench.py times (the
    --eval_dtype bf16 throughput mode by default)."""
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.pipelines import DiffusionPipeline
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler

    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=32)
    model = UNet2DModel(cfg, dtype=jnp.float32)
    params = jax.device_put(jax.jit(model.init_params)(jax.random.PRNGKey(0)))
    pipe = DiffusionPipeline(
        model, params, DDPMScheduler(DDPMConfig()),
        compute_dtype=jnp.bfloat16 if eval_dtype == "bf16" else None,
    )
    run = pipe._sample_fn(batch, steps, 0, None)
    init = jnp.zeros(pipe.sample_shape(batch), jnp.float32)
    key = jax.random.PRNGKey(0)
    compiled = run.lower(params, init, key).compile()
    ca = compiled.cost_analysis()
    # XLA's cost model counts a lax.scan/While BODY ONCE, not x trip-count
    # (verified: it reports ~0.9 TFLOP for 1000 steps of a UNet forward whose
    # single pass is ~0.9 TFLOP). Scale by the step count; the ops outside the
    # scan (init handling, final to_images) are negligible against 1000 bodies.
    flops = float(ca.get("flops", 0.0)) * steps
    bytes_moved = float(ca.get("bytes accessed", 0.0)) * steps
    t_compute = flops / V5E_PEAK_BF16_FLOPS
    t_mem = bytes_moved / V5E_HBM_BYTES_PER_S
    print(f"sampling ({steps} steps, batch {batch}, {eval_dtype}): "
          f"{flops/1e12:.2f} TFLOP, {bytes_moved/2**30:.1f} GiB moved (scan body x{steps})")
    print(f"  speed-of-light: compute {t_compute:.2f} s, memory {t_mem:.2f} s "
          f"-> bound: {'compute' if t_compute > t_mem else 'memory'}")
    sol_ips = batch / max(t_compute, t_mem)
    print(f"  SOL imgs/sec: {sol_ips:.2f}")
    if measure:
        images, _ = run(params, init, key)  # compile+warm (cached)
        jax.block_until_ready(images)
        t0 = time.perf_counter()
        images, _ = run(params, init, jax.random.PRNGKey(1))
        jax.block_until_ready(images)
        dt = time.perf_counter() - t0
        ips = batch / dt
        print(f"  measured: {dt:.2f} s = {ips:.2f} imgs/s "
              f"-> MFU {flops/dt/V5E_PEAK_BF16_FLOPS*100:.1f}%, "
              f"HBM util {bytes_moved/dt/V5E_HBM_BYTES_PER_S*100:.1f}%, "
              f"{ips/sol_ips*100:.1f}% of SOL")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true")
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--batch", type=int, default=128, help="micro-batch (per accumulation step)")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--sampling", action="store_true", help="analyze the 1000-step sampling scan instead")
    p.add_argument("--sampling_steps", type=int, default=1000)
    p.add_argument("--eval_dtype", choices=["bf16", "fp32"], default="bf16")
    a = p.parse_args()
    if a.sampling:
        sampling_main(a.measure, a.batch, a.sampling_steps, a.eval_dtype)
    else:
        main(a.measure, a.image_size, a.batch, a.grad_accum, a.remat)
