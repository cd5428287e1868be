"""Timed A/B harness for 32px train-step graph levers (VERDICT r4 #1).

Builds the exact bench.py 32px train step and times it (best of 3 windows),
honoring the env-gated graph experiments so each lever is one measured run:

    python examples/lever_bench.py                       # control
    BADDIFFUSION_GN_BARRIER=1 python examples/lever_bench.py
    BADDIFFUSION_FUSE_GN=1 python examples/lever_bench.py

Prints one JSON line {lever, step_ms, samples_per_sec} — compare against the
control row. Uses the shared persistent compile cache, so the control run is
a cache hit with bench.py's step.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
STEPS = 30


def main():
    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    lever = ",".join(
        f"{k}={v}" for k, v in sorted(os.environ.items()) if k.startswith("BADDIFFUSION_")
    ) or "control"

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

    t0 = time.perf_counter()
    for i in range(3):
        state, metrics = step(state, img, clean, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics["loss"])
    warm_s = time.perf_counter() - t0

    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step(state, img, clean, jax.random.PRNGKey(100 + w * STEPS + i))
        jax.block_until_ready(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / STEPS)

    print(json.dumps({
        "lever": lever,
        "step_ms": round(best * 1e3, 2),
        "samples_per_sec": round(BATCH / best, 1),
        "warmup_s": round(warm_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
