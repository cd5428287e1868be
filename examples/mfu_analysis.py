"""Roofline/MFU analysis of the headline train step and sampling forward.

Uses XLA's own cost model (``Compiled.cost_analysis``) on the exact jitted
programs bench.py times, then reports model FLOPs utilization against the
chip's peak (v5e ≈ 197 bf16 TFLOP/s) and HBM bandwidth utilization
(v5e ≈ 819 GB/s). This pins where the measured samples/sec sits relative to
speed-of-light, so perf work targets the true bottleneck.

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

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
BATCH = 128


def main(measure: bool) -> None:
    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=32)
    model = UNet2DModel(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))

    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(2e-4, num_warmup_steps=500, num_training_steps=10_000)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=32, batch_size=BATCH, fake_size=BATCH)
    dsl.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(
        model, optimizer, sched.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod, use_remat=False,
    )

    batch = next(dsl.epoch_batches(0))
    img = jnp.asarray(batch["image_u8"])
    clean = jnp.asarray(batch["is_clean"])
    key = jax.random.PRNGKey(0)

    lowered = jax.jit(step).lower(state, img, clean, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_moved = float(ca.get("bytes accessed", 0.0))
    t_compute = flops / V5E_PEAK_BF16_FLOPS
    t_mem = bytes_moved / V5E_HBM_BYTES_PER_S
    print(f"train step: {flops/1e9:.1f} GFLOP, {bytes_moved/2**30:.2f} GiB moved")
    print(f"  speed-of-light: compute {t_compute*1e3:.2f} ms, memory {t_mem*1e3:.2f} ms "
          f"-> bound: {'compute' if t_compute > t_mem else 'memory'}")
    sol_sps = BATCH / max(t_compute, t_mem)
    print(f"  SOL samples/sec (max(compute,mem)): {sol_sps:.0f}")

    if measure:
        s = state
        for i in range(3):
            s, m = step(s, img, clean, jax.random.PRNGKey(i))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        n = 30
        for i in range(n):
            s, m = step(s, img, clean, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / n
        sps = BATCH / dt
        print(f"  measured: {dt*1e3:.2f} ms/step = {sps:.0f} samples/s "
              f"-> MFU {flops/dt/V5E_PEAK_BF16_FLOPS*100:.1f}%, "
              f"HBM util {bytes_moved/dt/V5E_HBM_BYTES_PER_S*100:.1f}%, "
              f"{sps/sol_sps*100:.1f}% of SOL")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--measure", action="store_true")
    main(p.parse_args().measure)
