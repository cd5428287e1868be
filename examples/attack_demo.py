"""End-to-end backdoor-attack demonstration (offline, ~15 min on one v5e).

Trains a small UNet from scratch on the synthetic FAKE dataset with 30%
BOX_14→CORNER poisoning, then samples 64 images from pure noise and from
noise+trigger and reports MSE/SSIM against the backdoor target.

Measured result (v5e, 3000 steps, seed 0) — the paper's acceptance shape
(SURVEY.md §6: triggered generation collapses to the target, clean stays off):

    backdoor_mse  = 1.45e-4   backdoor_ssim = 0.998
    clean_mse     = 8.90e-2   clean_ssim    = 0.177

Run:  python examples/attack_demo.py [--steps 3000]
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

from baddiffusion_tpu.data import DatasetLoader
from baddiffusion_tpu.metrics import mse, ssim
from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
from baddiffusion_tpu.pipelines import DiffusionPipeline
from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step
from baddiffusion_tpu.utils.image import save_image_grid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--out", type=str, default="attack_demo_out")
    args = parser.parse_args()

    cfg = UNet2DConfig(
        sample_size=32, layers_per_block=2, block_out_channels=(64, 128, 256),
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        norm_num_groups=32, attention_head_dim=8,
    )
    model = UNet2DModel(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))

    sched = DDPMScheduler(DDPMConfig())
    ss = sched.create_state()
    opt, _ = make_optimizer(2e-4, num_warmup_steps=200, num_training_steps=args.steps)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=32, batch_size=128, fake_size=2048)
    dsl.set_poison("BOX_14", "CORNER", poison_rate=0.3).prepare_dataset()
    state = create_train_state(params, opt, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(model, opt, 1000, ss.schedule.alphas, ss.schedule.alphas_cumprod)

    t0, gstep, epoch = time.time(), 0, 0
    while gstep < args.steps:
        for batch in dsl.epoch_batches(epoch):
            state, m = step(state, batch["image_u8"], batch["is_clean"],
                            jax.random.fold_in(jax.random.PRNGKey(0), gstep))
            gstep += 1
            if gstep % 500 == 0:
                print(f"step {gstep}: loss={float(m['loss']):.4f} ({time.time() - t0:.0f}s)", flush=True)
            if gstep >= args.steps:
                break
        epoch += 1

    pipe = DiffusionPipeline(model, jax.device_get(state.params), sched, default_inference_steps=1000)
    key = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(key, (64, 32, 32, 3), dtype=np.float32))
    clean = pipe(init=noise, key=key, num_inference_steps=1000).images
    bd = pipe(init=noise + dsl.trigger[None], key=key, num_inference_steps=1000).images

    target01 = np.clip(dsl.target / 2 + 0.5, 0, 1)
    tiled = np.ascontiguousarray(np.broadcast_to(target01, bd.shape))
    res = {
        "backdoor_mse": float(mse(bd, tiled)),
        "backdoor_ssim": float(ssim(bd, tiled)),
        "clean_mse_to_target": float(mse(clean, tiled)),
        "clean_ssim_to_target": float(ssim(clean, tiled)),
    }
    print(json.dumps(res, indent=2))
    os.makedirs(args.out, exist_ok=True)
    save_image_grid(bd[:16], os.path.join(args.out, "backdoor_grid.png"), 4, 4)
    save_image_grid(clean[:16], os.path.join(args.out, "clean_grid.png"), 4, 4)
    json.dump(res, open(os.path.join(args.out, "result.json"), "w"))
    # save the backdoored pipeline + args.json so the ANP defense CLI can
    # consume this run directly (anp_config reads trigger/target/dataset)
    pipe.save_pretrained(args.out)
    json.dump(
        {"trigger": "BOX_14", "target": "CORNER", "poison_rate": 0.3,
         "dataset": "FAKE", "learning_rate": 2e-4},
        open(os.path.join(args.out, "args.json"), "w"),
    )


if __name__ == "__main__":
    main()
