"""ANP defense demonstration: break the backdoor planted by attack_demo.py.

Loads the backdoored pipeline saved by ``attack_demo.py --out <dir>``, runs
the ANP perturbation (maximize clean DDPM loss over conv γ/β within
±perturb_budget — reference anp_defense.py), and compares TRIGGERED sampling
against the backdoor target before and after:

    before ANP:  backdoor_mse ≈ 1e-4   (trigger reliably produces the target)
    after  ANP:  backdoor_mse rises sharply (backdoor disrupted)

Run:  python examples/defense_demo.py --ckpt <attack_demo out dir> [--steps 300]
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
from baddiffusion_tpu.defense import apply_perturb, init_perturb, make_anp_step
from baddiffusion_tpu.metrics import mse
from baddiffusion_tpu.pipelines import DiffusionPipeline
from baddiffusion_tpu.training import make_optimizer


def triggered_mse(pipe, dsl, n=16, steps=1000):
    key = jax.random.PRNGKey(0)
    noise = np.asarray(jax.random.normal(key, pipe.sample_shape(n), np.float32))
    bd = pipe(init=noise + dsl.trigger[None], key=key, num_inference_steps=steps).images
    target01 = np.clip(dsl.target / 2 + 0.5, 0, 1)
    return float(mse(bd, np.ascontiguousarray(np.broadcast_to(target01, bd.shape))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--budget", type=float, default=4.0)
    parser.add_argument("--lr", type=float, default=1e-4)
    args = parser.parse_args()

    from baddiffusion_tpu import factory

    model, params, scheduler, get_pipeline = factory.get_trained(args.ckpt)
    meta = json.load(open(os.path.join(args.ckpt, "args.json")))
    dsl = DatasetLoader(meta["dataset"], batch_size=128, fake_size=2048)
    dsl.set_poison(meta["trigger"], meta["target"], clean_rate=0.0, poison_rate=1.0)
    dsl.prepare_dataset()

    pipe0 = get_pipeline(params, scheduler)
    before = triggered_mse(pipe0, dsl)
    print(f"backdoor_mse before ANP: {before:.6f}", flush=True)

    ss = scheduler.create_state()
    opt, _ = make_optimizer(args.lr, schedule="constant")
    perturb = init_perturb(params)
    opt_state = opt.init(perturb)
    step = make_anp_step(model, opt, scheduler.config.num_train_timesteps,
                         ss.schedule.alphas, ss.schedule.alphas_cumprod,
                         perturb_budget=args.budget)
    trig, tgt, mask = jnp.asarray(dsl.trigger), jnp.asarray(dsl.target), jnp.asarray(dsl.mask)

    t0, gstep, epoch = time.time(), 0, 0
    while gstep < args.steps:
        for batch in dsl.epoch_batches(epoch):
            perturb, opt_state, m = step(params, perturb, opt_state,
                                         batch["image_u8"], batch["is_clean"],
                                         trig, tgt, mask,
                                         jax.random.fold_in(jax.random.PRNGKey(1), gstep))
            gstep += 1
            if gstep % 100 == 0:
                print(f"anp step {gstep}: clean_mse={float(m['clean_mse']):.4f} "
                      f"backdoor_mse_diag={float(m['backdoor_mse']):.4f} ({time.time()-t0:.0f}s)", flush=True)
            if gstep >= args.steps:
                break
        epoch += 1

    pruned = apply_perturb(params, jax.device_get(perturb))
    pipe1 = get_pipeline(pruned, scheduler)
    after = triggered_mse(pipe1, dsl)
    print(f"backdoor_mse after ANP:  {after:.6f}", flush=True)
    print(json.dumps({"backdoor_mse_before": before, "backdoor_mse_after": after}))


if __name__ == "__main__":
    main()
