"""ANP perturb-budget dose-response sweep (VERDICT r4 task 6).

The budget is THE knob the ANP defense paper turns: too small and the
perturbation can't reach the backdoor neurons, too large and clean quality
collapses. The reference exposes it as `--perturb_budget` (anp_config.py:27,
default 4.0; README.md:115) but only ever documents the single default
point. This sweeps the canonical backdoored checkpoint across budgets and
records the backdoor-MSE / clean-quality trade-off curve:

    ANP_SWEEP.json: {budget: {MSE_best, SSIM_best, MSE_final, SSIM_final,
                              run_dir}}

Each budget is a full reference-recipe ANP run (5 epochs, lr 1e-4,
fully-poisoned loader) through the production `anp_cli.main()`; per-epoch
sampling/measure with best-tracking writes score.json in each run dir
(reference anp_util.py:233-270).

Run:  python examples/anp_dose_response.py --ckpt <run_dir> \
          [--budgets 0.5 1 2 4] [--n 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--budgets", nargs="*", type=float, default=[0.5, 1.0, 2.0, 4.0])
    p.add_argument("--epoch", type=int, default=5)
    p.add_argument("--n", type=int, default=128, help="measure_sample_n per epoch")
    p.add_argument("--sampling_steps", type=int, default=1000)
    p.add_argument("--eval_dtype", default="bf16")
    p.add_argument("--out", default="ANP_SWEEP.json")
    args = p.parse_args()

    from baddiffusion_tpu import anp_cli

    table = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f)

    for budget in args.budgets:
        key = f"{budget:g}"
        if key in table:
            print(f"[anp-sweep] budget {key}: already recorded, skipping", flush=True)
            continue
        print(f"[anp-sweep] budget {key}", flush=True)
        t0 = time.time()
        anp_cli.main([
            "--ckpt", args.ckpt,
            "--perturb_budget", key,
            "--epoch", str(args.epoch),
            "--measure_sample_n", str(args.n),
            "--sampling_steps", str(args.sampling_steps),
            "--eval_dtype", args.eval_dtype,
        ])
        wall = time.time() - t0
        # res_anp_{ep}_lr{lr}_pb{budget}_{ckpt} (anp_cli.naming_fn; the ckpt
        # component is the raw --ckpt string, reference anp_config.py:48-51)
        run_dir = f"res_anp_{args.epoch}_lr0.0001_pb{budget}_{args.ckpt}"
        with open(os.path.join(run_dir, "score.json")) as f:
            sc = json.load(f)
        last_ep = args.epoch - 1
        table[key] = {
            "MSE_best": sc.get("MSE_best"),
            "SSIM_best": sc.get("SSIM_best"),
            "MSE_final": sc.get(f"MSE_ep{last_ep}"),
            "SSIM_final": sc.get(f"SSIM_ep{last_ep}"),
            "run_dir": run_dir,
            "wall_s": round(wall, 1),
        }
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"[anp-sweep] budget {key}: {table[key]}", flush=True)

    # clean-quality side of the dose-response curve: each ANP run dir holds
    # the PERTURBED pipeline export (anp_cli saves it at the end); sample the
    # clean branch and score FID against the measure dump of the real images
    # (the reference's ANP loop never quantifies this side — MSE/SSIM vs the
    # target only, anp_util.py:233-270 — but 'budget destroys the backdoor'
    # is only half the trade-off)
    import numpy as np

    from baddiffusion_tpu import factory
    from baddiffusion_tpu.metrics.fid import fid as fid_fn
    from baddiffusion_tpu.utils.image import save_images

    with open(os.path.join(args.ckpt, "args.json")) as f:
        dataset = json.load(f)["dataset"] or "CIFAR10"
    dataset_dir = os.path.join("measure", dataset)
    for key, row in sorted(table.items(), key=lambda kv: float(kv[0])):
        if "clean_FID_proxy" in row or not os.path.isdir(dataset_dir):
            continue
        import jax
        import jax.numpy as jnp

        _m, params, scheduler, get_pipe = factory.get_trained(
            row["run_dir"], clip_sample=False, dtype=jnp.float32
        )
        pipe = get_pipe(params, scheduler)
        pipe.compute_dtype = jnp.bfloat16 if args.eval_dtype == "bf16" else jnp.float32
        k = jax.random.PRNGKey(0)
        noise = np.asarray(jax.random.normal(k, pipe.sample_shape(args.n), np.float32))
        imgs = pipe(init=noise, key=k, num_inference_steps=args.sampling_steps).images
        d = os.path.join(row["run_dir"], "clean_fid_samples")
        save_images(np.asarray(imgs), d)
        row["clean_FID_proxy"] = float(fid_fn([dataset_dir, d]))
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)
        print(f"[anp-sweep] budget {key}: clean_FID_proxy={row['clean_FID_proxy']:.2f}", flush=True)

    print(json.dumps(table, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
