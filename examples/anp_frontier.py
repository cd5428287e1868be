"""ANP defense Pareto frontier: lr x epochs at binding budgets (VERDICT r4 #4).

Round 4's budget-only dose-response (examples/anp_dose_response.py,
ANP_SWEEP.json) found no usable operating point at the reference recipe's lr
1e-4 / 5 epochs: every budget <=1 that breaks the backdoor also destroys
clean quality, and budgets >=2 never bind (the gamma-scale mechanism note in
PARITY.md). That is a ONE-recipe claim. This sweeps the recipe's other two
knobs — lr (reference default 1e-4, anp_config.py:22) and epochs
(README.md:115 uses 5) — at budgets where the clamp binds, recording BOTH
sides of the trade-off per point:

    ANP_FRONTIER.json: {"pb{b}_lr{lr}_ep{E}": {MSE_best, SSIM_best,
        MSE_final, SSIM_final, clean_FID_proxy, run_dir, wall_s}}

Each point is a full production `anp_cli.main()` run (fully-poisoned loader,
per-epoch measure with *_best tracking) + a clean-branch FID_proxy pass of
the final perturbed model against the staged measure dump.

Run:  python examples/anp_frontier.py --ckpt <run_dir> \
          [--budgets 0.5 1] [--lrs 2e-5 1e-4 5e-4] [--epochs 5 15] [--n 128]
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clean_fid_for(run_dir: str, dataset_dir: str, n: int, sampling_steps: int, eval_dtype: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from baddiffusion_tpu import factory
    from baddiffusion_tpu.metrics.fid import fid as fid_fn
    from baddiffusion_tpu.utils.image import save_images

    _m, params, scheduler, get_pipe = factory.get_trained(
        run_dir, clip_sample=False, dtype=jnp.float32
    )
    pipe = get_pipe(params, scheduler)
    pipe.compute_dtype = jnp.bfloat16 if eval_dtype == "bf16" else jnp.float32
    k = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(k, pipe.sample_shape(n), np.float32))
    imgs = pipe(init=noise, key=k, num_inference_steps=sampling_steps).images
    d = os.path.join(run_dir, "clean_fid_samples")
    save_images(np.asarray(imgs), d)
    return float(fid_fn([dataset_dir, d]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--budgets", nargs="*", type=float, default=[0.5, 1.0])
    p.add_argument("--lrs", nargs="*", type=float, default=[2e-5, 1e-4, 5e-4])
    p.add_argument("--epochs", nargs="*", type=int, default=[5])
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--sampling_steps", type=int, default=1000)
    p.add_argument("--eval_dtype", default="bf16")
    p.add_argument("--out", default="ANP_FRONTIER.json")
    args = p.parse_args()

    from baddiffusion_tpu import anp_cli

    table = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f)

    with open(os.path.join(args.ckpt, "args.json")) as f:
        dataset = json.load(f)["dataset"] or "CIFAR10"
    dataset_dir = os.path.join("measure", dataset)

    for budget, lr, ep in itertools.product(args.budgets, args.lrs, args.epochs):
        key = f"pb{budget:g}_lr{lr:g}_ep{ep}"
        if key in table:
            print(f"[frontier] {key}: already recorded, skipping", flush=True)
            continue
        print(f"[frontier] {key}", flush=True)
        t0 = time.time()
        anp_cli.main([
            "--ckpt", args.ckpt,
            "--perturb_budget", f"{budget:g}",
            "--learning_rate", f"{lr:g}",
            "--epoch", str(ep),
            "--measure_sample_n", str(args.n),
            "--sampling_steps", str(args.sampling_steps),
            "--eval_dtype", args.eval_dtype,
        ])
        wall = time.time() - t0
        run_dir = f"res_anp_{ep}_lr{lr}_pb{budget}_{args.ckpt}"
        with open(os.path.join(run_dir, "score.json")) as f:
            sc = json.load(f)
        row = {
            "MSE_best": sc.get("MSE_best"),
            "SSIM_best": sc.get("SSIM_best"),
            "MSE_final": sc.get(f"MSE_ep{ep}"),
            "SSIM_final": sc.get(f"SSIM_ep{ep}"),
            "run_dir": run_dir,
            "wall_s": round(wall, 1),
        }
        if os.path.isdir(dataset_dir):
            row["clean_FID_proxy"] = round(clean_fid_for(
                run_dir, dataset_dir, args.n, args.sampling_steps, args.eval_dtype
            ), 2)
        table[key] = row
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"[frontier] {key}: {row}", flush=True)

    print(json.dumps(table, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
