"""Sampling/eval hot-path batch sweep (VERDICT r4 #2).

The measure path samples 2x measure_sample_n images through the 1000-step
DDPM chain in eval_max_batch chunks (reference baddiffusion.py:24,519-529 —
the reference's own default is 256). Round 4 tuned the 256px TRAIN step by
sweeping its micro-batch; this applies the same methodology to the sampler:
sweep the per-program batch (and optionally --sample_segment) on the exact
bench.py sampling configuration and record imgs/sec per point.

Run:  python examples/sampling_batch_sweep.py [--batches 64 128 256 512]
          [--segments 0] [--steps 1000]
Prints one JSON line per point; machine-readable winner at the end.
"""

import argparse
import dataclasses
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int, default=[64, 128, 256, 512])
    p.add_argument("--segments", nargs="*", type=int, default=[0],
                   help="0 = single program; k = --sample_segment k")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--out", default="")
    args = p.parse_args()

    from baddiffusion_tpu.models import DEFAULT_SCRATCH_CONFIG, UNet2DModel
    from baddiffusion_tpu.pipelines import DiffusionPipeline
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler

    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=32)
    model = UNet2DModel(cfg, dtype=jnp.float32)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    pipe = DiffusionPipeline(model, jax.device_get(params), sched, compute_dtype=jnp.bfloat16)

    rows = []
    for seg in args.segments:
        pipe.segment_steps = seg or None
        for b in args.batches:
            init = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (b, 32, 32, 3), jnp.float32))
            try:
                np.asarray(pipe(init=init, num_inference_steps=args.steps,
                                key=jax.random.PRNGKey(8)).images)  # compile+warm
                best = float("inf")
                for i in range(2):
                    t0 = time.perf_counter()
                    imgs = pipe(init=init, num_inference_steps=args.steps,
                                key=jax.random.PRNGKey(9 + i)).images
                    np.asarray(imgs)  # hard host sync
                    best = min(best, time.perf_counter() - t0)
                row = {"batch": b, "segment": seg or None, "steps": args.steps,
                       "imgs_per_sec": round(b / best, 2), "wall_s": round(best, 2)}
            except Exception as exc:
                row = {"batch": b, "segment": seg or None,
                       "error": f"{type(exc).__name__}: {exc}"[:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)

    ok = [r for r in rows if "imgs_per_sec" in r]
    if ok:
        win = max(ok, key=lambda r: r["imgs_per_sec"])
        print(json.dumps({"winner": win, "rows": rows}))
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"winner": win, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
