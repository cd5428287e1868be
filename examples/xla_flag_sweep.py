"""XLA backend-flag sweep for the 32px train step — via compiler_options.

Round-4 finding, now REVISED: the axon tunnel rejects backend flags passed
through the XLA_FLAGS env var, but per-compile ``compiler_options`` given to
``jit(f).lower(...).compile(...)`` ARE parsed by the remote compile helper
(verified: a bogus option name fails the remote compile with HTTP 500, so
options are not silently dropped). That re-opens the backend-flag lever the
round-3/4 notes recorded as environment-blocked.

Sweeps each candidate option set on the EXACT bench.py 32px train step in
one process (model/data built once, one compile per candidate), timing with
a hard host sync (``float(loss)`` — block_until_ready alone can return
before device completion through this tunnel; see examples/conv_shape_probe).

Usage:
    python examples/xla_flag_sweep.py            # sweep all candidates
Prints one JSON line per configuration plus a ranked table.
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

CANDIDATES = [
    {},  # control: current defaults
    {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # ExecutableBuildOptions effort knobs (jax passes non--xla_* keys through
    # to build options): spend more compile time on execution-time opts.
    # NOTE these setters are TYPED (pybind11 rejects strings): effort is a
    # float in [-1, 1], optimization_level an int enum (3 = EFFORT_O3).
    {"exec_time_optimization_effort": 1.0},
    {"optimization_level": 3},
    {"xla_tpu_scoped_vmem_limit_kib": "32768", "exec_time_optimization_effort": 1.0},
]


def build():
    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

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
    return step, state, img, clean


def measure_one(step, state, img, clean, options):
    """Compile the step with ``options`` and return (step_ms, fresh_state).

    The jitted step donates its state argument, so each candidate gets its
    own state copy; timing is over chained (state-dependent) calls with a
    final hard host sync."""
    state = jax.tree.map(jnp.array, state)  # private buffers (donation)
    t0 = time.perf_counter()
    compiled = step.lower(state, img, clean, jax.random.PRNGKey(0)).compile(
        compiler_options=options or None
    )
    compile_s = time.perf_counter() - t0
    for i in range(3):
        state, metrics = compiled(state, img, clean, jax.random.PRNGKey(i))
    float(metrics["loss"])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = compiled(state, img, clean, jax.random.PRNGKey(100 + w * STEPS + i))
        float(metrics["loss"])  # hard sync
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3, compile_s


def main():
    step, state, img, clean = build()
    results = []
    for options in CANDIDATES:
        tag = ",".join(f"{k}={v}" for k, v in options.items()) or "control"
        try:
            ms, compile_s = measure_one(step, state, img, clean, options)
            row = {"options": tag, "step_ms": round(ms, 2),
                   "samples_per_sec": round(BATCH / ms * 1e3, 1),
                   "compile_s": round(compile_s, 1)}
        except Exception as exc:
            row = {"options": tag, "error": f"{type(exc).__name__}: {exc}"[:300]}
        results.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in results if "step_ms" in r]
    ok.sort(key=lambda r: r["step_ms"])
    print("\n== ranked ==")
    for r in ok:
        print(f"{r['step_ms']:8.2f} ms  {r['samples_per_sec']:8.1f} samples/s  {r['options']}")


if __name__ == "__main__":
    main()
