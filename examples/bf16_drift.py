"""Quantify the --eval_dtype bf16 accuracy bill on a fixed checkpoint.

The bf16 sampling mode (pipeline.compute_dtype = bf16) roughly doubles
throughput on TPU (weights stream at half the HBM bytes, MXU at bf16 rate);
this script measures what that costs in metric terms: it samples n clean and
n backdoor images in f32 and in bf16 from IDENTICAL inits and keys, then
reports MSE/SSIM (backdoor branch vs the tiled target) and FID_proxy (clean
branch vs dataset images) per dtype and the deltas.

Decision rule (recorded in PARITY.md): bf16 is admissible for measure while
|ΔMSE| stays orders of magnitude below the planted-vs-clean backdoor-MSE gap
(~1e-3 planted vs ~0.2 unplanted at canonical scale, SURVEY.md §6) — a drift
that small cannot flip the planted/not classification.

Run (after examples/attack_demo.py):
    python examples/bf16_drift.py --ckpt attack_demo_out [--n 256]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from baddiffusion_tpu.data import DatasetLoader
from baddiffusion_tpu.metrics import fid as fid_fn
from baddiffusion_tpu.metrics import mse, ssim
from baddiffusion_tpu.pipelines import DiffusionPipeline, batch_sampling
from baddiffusion_tpu.utils.image import save_images


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="attack_demo_out")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--trigger", type=str, default="BOX_14")
    p.add_argument("--target", type=str, default="CORNER")
    p.add_argument("--out", type=str, default="bf16_drift_out")
    args = p.parse_args()

    pipe = DiffusionPipeline.from_pretrained(args.ckpt, dtype=jnp.float32)
    size = pipe.unet.config.sample_size
    ch = pipe.unet.config.in_channels

    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=size, channel=ch, batch_size=args.batch,
                        fake_size=max(args.n, 256))
    dsl.set_poison(args.trigger, args.target, poison_rate=0.3).prepare_dataset()
    target01 = np.clip(dsl.target / 2.0 + 0.5, 0, 1)

    key = jax.random.PRNGKey(0)
    init = np.asarray(jax.random.normal(key, (args.n, size, size, ch), jnp.float32))
    binit = init + dsl.trigger[None]

    os.makedirs(args.out, exist_ok=True)
    real_dir = os.path.join(args.out, "real")
    if not os.path.isdir(real_dir):
        save_images(dsl.real_image_sample(args.n).astype(np.float32) / 255.0, real_dir)

    results = {}
    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        pipe.compute_dtype = dtype
        t0 = time.perf_counter()
        clean = batch_sampling(args.n, pipe, init=init, max_batch_n=args.batch,
                               key=key, num_inference_steps=args.steps)
        bd = batch_sampling(args.n, pipe, init=binit, max_batch_n=args.batch,
                            key=key, num_inference_steps=args.steps)
        dt = time.perf_counter() - t0
        clean_dir = os.path.join(args.out, f"clean_{tag}")
        save_images(clean, clean_dir)
        tiled = np.broadcast_to(target01, bd.shape)
        results[tag] = {
            "MSE": float(mse(bd, tiled)),
            "SSIM": float(ssim(bd, np.ascontiguousarray(tiled))),
            "FID_proxy": float(fid_fn([real_dir, clean_dir])),
            "imgs_per_sec": round(2 * args.n / dt, 2),
        }
        print(tag, results[tag], flush=True)

    deltas = {k: results["bf16"][k] - results["f32"][k] for k in ("MSE", "SSIM", "FID_proxy")}
    summary = {"f32": results["f32"], "bf16": results["bf16"], "delta_bf16_minus_f32": deltas,
               "n": args.n, "steps": args.steps, "ckpt": args.ckpt}
    with open(os.path.join(args.out, "drift.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
