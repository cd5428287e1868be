"""Sampler-zoo hardware matrix (BASELINE config #3; reference model.py:592-637).

Drives ``--mode measure --sched <name>`` through the real CLI for EVERY
dispatched scheduler name against one backdoored checkpoint — the
cross-sampler evaluation the reference exposes (baddiffusion.py:154-173
reload + measure :477-551) — and records a machine-readable per-sampler
table at the repo root:

    SWEEP.json: {sched: {FID_proxy, MSE, SSIM, imgs_per_sec, steps, wall_s}}

KarrasVe is not CLI-dispatched (the reference defines EDM_* constants but
never dispatches them, model.py:466,546-563); it gets a sampling-only row
driven through the library pipeline.

Run:  python examples/sampler_sweep.py --ckpt <run_dir> [--n 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCHEDS = [
    "DDPM-SCHED", "DDIM-SCHED", "PNDM-SCHED", "DEIS-SCHED", "HEUN-SCHED",
    "LMSD-SCHED", "UNIPC-SCHED",
    "DPM_SOLVER_PP_O1-SCHED", "DPM_SOLVER_PP_O2-SCHED", "DPM_SOLVER_PP_O3-SCHED",
    "DPM_SOLVER_O1-SCHED", "DPM_SOLVER_O2-SCHED", "DPM_SOLVER_O3-SCHED",
    "SCORE-SDE-VE-SCHED",
]


def timed_sampling(ckpt: str, sched: str, n: int, seed: int = 0):
    """Steady-state imgs/sec: one warm call then one timed call, both the
    full batch in one program invocation (compile amortized by the measure
    run + the warm call)."""
    from baddiffusion_tpu import factory

    _model, params, scheduler, get_pipe = factory.get_trained(
        ckpt, clip_sample=False, noise_sched_type=sched, dtype=jnp.float32
    )
    pipe = get_pipe(params, scheduler)
    steps = pipe.default_inference_steps
    key = jax.random.PRNGKey(seed)
    shape = pipe.sample_shape(n)
    noise = np.asarray(jax.random.normal(key, shape, dtype=np.float32))
    pipe(init=noise, key=key).images  # warm
    t0 = time.time()
    imgs = pipe(init=noise, key=key).images
    dt = time.time() - t0
    return n / dt, steps, imgs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n", type=int, default=256, help="measure sample count per branch")
    p.add_argument("--time_n", type=int, default=64, help="batch for the imgs/sec timing")
    p.add_argument("--eval_max_batch", type=int, default=None,
                   help="per-invocation sampling chunk (default: --n in one program; "
                   "lower it for long chains like SDE-VE's 2000-step PC sampler, "
                   "which can outlive the device worker in one invocation)")
    p.add_argument("--out", default="SWEEP.json")
    p.add_argument("--scheds", nargs="*", default=SCHEDS)
    args = p.parse_args()

    from baddiffusion_tpu import cli

    table = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f)

    score_path = os.path.join(args.ckpt, "score.json")
    for sched in args.scheds:
        if sched in table:
            print(f"[sweep] {sched}: already recorded, skipping", flush=True)
            continue
        print(f"[sweep] measure --sched {sched}", flush=True)
        t0 = time.time()
        cli.main([
            "--mode", "measure", "--ckpt", args.ckpt, "--sched", sched,
            "--measure_sample_n", str(args.n),
            "--eval_max_batch", str(args.eval_max_batch or args.n),
        ])
        wall = time.time() - t0
        with open(score_path) as f:
            sc = json.load(f)
        ips, steps, _ = timed_sampling(args.ckpt, sched, args.time_n)
        table[sched] = {
            "FID_proxy": sc.get("FID_proxy_noclip", sc.get("FID_proxy")),
            "MSE": sc.get("MSE_noclip", sc.get("MSE")),
            "SSIM": sc.get("SSIM_noclip", sc.get("SSIM")),
            "imgs_per_sec": round(ips, 3),
            "steps": steps,
            "measure_wall_s": round(wall, 1),
            "measure_sample_n": args.n,
        }
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"[sweep] {sched}: {table[sched]}", flush=True)

    # KarrasVe sampling-only row (never CLI-dispatched; reference model.py:466)
    if "KARRAS-VE (sampling only)" not in table:
        print("[sweep] KarrasVe sampling run", flush=True)
        # build via library: swap in a KarrasVe scheduler explicitly
        from baddiffusion_tpu import factory
        from baddiffusion_tpu.schedulers import KarrasVeConfig, KarrasVeScheduler
        from baddiffusion_tpu.pipelines import DiffusionPipeline
        from baddiffusion_tpu.utils.image import save_image_grid

        _model, params, _sched, _gp = factory.get_trained(
            args.ckpt, clip_sample=False, dtype=jnp.float32
        )
        pipe = DiffusionPipeline(
            _model, params, KarrasVeScheduler(KarrasVeConfig()),
            default_inference_steps=50, hf_class_name="KarrasVePipeline",
        )
        key = jax.random.PRNGKey(0)
        noise = np.asarray(jax.random.normal(key, pipe.sample_shape(args.time_n), dtype=np.float32))
        pipe(init=noise, key=key).images  # warm
        t0 = time.time()
        imgs = pipe(init=noise, key=key).images
        ips = args.time_n / (time.time() - t0)
        os.makedirs(os.path.join(args.ckpt, "karras_ve_samples"), exist_ok=True)
        save_image_grid(imgs[:16], os.path.join(args.ckpt, "karras_ve_samples", "grid.png"), 4, 4)
        table["KARRAS-VE (sampling only)"] = {
            "imgs_per_sec": round(ips, 3), "steps": 50,
            "note": "not CLI-dispatched (reference parity); library sampling run",
        }
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)

    print(json.dumps(table, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
