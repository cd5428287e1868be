"""XLA-flag sweep for the 32px backdoor train step (bench.py conditions).

DESIGN.md "Roofline position": the 32px step is compute-pipeline-bound
(41.6% MFU, 38% HBM) — neither functional unit saturated, the gap is conv
mapping. XLA exposes the relevant knobs only as process-level flags, so this
harness re-launches itself once per candidate XLA_FLAGS value and measures
the identical step program (warmup + best-of-3 20-step windows, exactly the
bench.py protocol).

Measured result (round 4, axon-tunneled v5e): the tunnel's HOST-side XLA
client hard-rejects TPU backend flags at parse time
(`Unknown flag in XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib`, F-level
abort in parse_flags_from_env.cc) — backend compiler options never reach the
server-side compiler through this transport, so flag-level conv tuning is
unavailable in this environment. Control measurement: 3850.8 samples/s /
33.24 ms, matching bench.py. On a directly-attached TPU the sweep below is
live; re-run this script there.

Usage:
    python examples/xla_flag_sweep.py                    # sweep all candidates
    python examples/xla_flag_sweep.py --one '<flags>'    # single measurement
    python examples/xla_flag_sweep.py --one              # control (no flags)

``--one <flags>`` sets XLA_FLAGS before jax imports, so the flags really
apply to the measured process (equivalently: XLA_FLAGS='<flags>' ... --one).

Prints one JSON line per configuration; parent prints a ranked table.
"""

import json
import os
import subprocess
import sys
import time

CANDIDATES = [
    "",  # control: current defaults
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
    "--xla_tpu_enable_latency_hiding_scheduler=false",
]


def measure():
    import dataclasses

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    for i in range(3):
        state, metrics = step(state, img, clean, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics["loss"])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(20):
            state, metrics = step(state, img, clean, jax.random.PRNGKey(100 + w * 20 + i))
        jax.block_until_ready(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "samples_per_sec": round(BATCH * 20 / best, 1),
        "step_ms": round(best / 20 * 1e3, 2),
    }))


def main():
    if "--one" in sys.argv:
        # honor an explicit flags operand: it must land in XLA_FLAGS before
        # jax initializes its backend inside measure()
        pos = sys.argv.index("--one")
        if pos + 1 < len(sys.argv) and sys.argv[pos + 1]:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + sys.argv[pos + 1]
            ).strip()
        measure()
        return
    import hashlib

    results = []
    for flags in CANDIDATES:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # fresh compile: flag changes invalidate cached executables anyway,
        # but keep the persistent cache out of the way to be safe. Stable
        # digest (not hash(): randomized per process) so re-runs reuse dirs.
        digest = hashlib.sha1(flags.encode()).hexdigest()[:8]
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/xla_flag_sweep_cache_" + digest
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                env=env, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            # one hung candidate must not abort the sweep and lose prior rows
            print(json.dumps({"xla_flags": flags, "error": "timeout"}), flush=True)
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            err = r.stderr[-400:].replace("WARNING", "WARN")  # keep greppable
            print(json.dumps({"xla_flags": flags, "error": err}), flush=True)
    if results:
        results.sort(key=lambda x: -x["samples_per_sec"])
        print("\nranked:")
        for r in results:
            print(f"  {r['samples_per_sec']:8.1f} samples/s  {r['step_ms']:6.2f} ms  {r['xla_flags'] or '(default)'}")


if __name__ == "__main__":
    main()
