"""256px grad-accumulation structure shootout (round-4 perf investigation).

Measured HBM traffic showed the 256px canonical step (micro-batch 4 x
grad-accum 16, no-remat) spends ~20% of device time in raw `copy` ops and
~16% in `broadcast` — XLA's copy-insertion around the lax.scan carry (the
454 MB f32 grad-accumulator tree) — while streaming 69% of the HBM roof at
only 18% MFU. This times alternative accumulation structures on hardware:

  scan        — the shipping structure (lax.scan over micro-batches)
  scan_u4     — same, unroll=4 (copy machinery amortized over 4 bodies)
  unrolled    — python-loop accumulation (no scan carry at all)
  remat_full  — ONE full-batch backward with jax.checkpoint (no accumulator;
                bigger convs tile the MXU better; +~33% FLOPs recompute)

Usage: python examples/accum_variants.py [--variants scan scan_u4 ...]
Prints one JSON line per variant: {variant, step_ms, samples_per_sec}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from baddiffusion_tpu.attack.loss import backdoor_loss
from baddiffusion_tpu.data.datasets import DatasetLoader
from baddiffusion_tpu.data.poison import poison_batch
from baddiffusion_tpu.models import UNet2DModel
from baddiffusion_tpu.models.unet2d import DEFAULT_SCRATCH_CONFIG
from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
from baddiffusion_tpu.training import create_train_state, make_optimizer

GLOBAL = 64
ACCUM = 16


def build_step(model, optimizer, alphas, alphas_cumprod, variant: str):
    """variant: 'scan' | 'scan_u4' | 'unrolled' | 'remat_full' | 'scan@K'
    (scan with accum K, micro GLOBAL//K — same global-batch math; the
    reference's micro-batch 4 is a GPU-memory artifact, not semantics)."""
    global ACCUM
    if variant.startswith("scan@"):
        ACCUM = int(variant.split("@")[1])
        variant = "scan"
    T = 1000

    def apply_plain(params, x, t):
        return model.apply({"params": params}, x, t)

    apply_remat = jax.checkpoint(model.apply)

    def loss_for(params, trigger, target, mask, image_u8, is_clean, key, apply_fn):
        image, R, x_start = poison_batch(image_u8, is_clean, trigger, target, mask, -1.0, 1.0)
        k_t, k_eps = jax.random.split(key)
        b = image_u8.shape[0]
        t = jax.random.randint(k_t, (b,), 0, T)
        noise = jax.random.normal(k_eps, x_start.shape, jnp.float32)
        return backdoor_loss(apply_fn, params, alphas, alphas_cumprod, x_start, R, t, noise, "l2")

    def accum_grads_scan(state, image_u8, is_clean, key, unroll):
        micro = image_u8.shape[0] // ACCUM
        imgs = image_u8.reshape((ACCUM, micro) + image_u8.shape[1:])
        clean = is_clean.reshape((ACCUM, micro))
        keys = jax.random.split(key, ACCUM)

        def body(carry, xs):
            loss_acc, grad_acc = carry
            img, cl, k = xs
            l, g = jax.value_and_grad(loss_for)(
                state.params, state.trigger, state.target, state.mask, img, cl, k,
                lambda p, x, t: apply_plain(p, x, t),
            )
            return (loss_acc + l, jax.tree.map(jnp.add, grad_acc, g)), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (loss, grads), _ = jax.lax.scan(body, (0.0, zero), (imgs, clean, keys), unroll=unroll)
        return loss / ACCUM, jax.tree.map(lambda g: g / ACCUM, grads)

    def accum_grads_unrolled(state, image_u8, is_clean, key):
        micro = image_u8.shape[0] // ACCUM
        keys = jax.random.split(key, ACCUM)
        loss = 0.0
        grads = None
        for i in range(ACCUM):
            img = jax.lax.dynamic_slice_in_dim(image_u8, i * micro, micro)
            cl = jax.lax.dynamic_slice_in_dim(is_clean, i * micro, micro)
            l, g = jax.value_and_grad(loss_for)(
                state.params, state.trigger, state.target, state.mask, img, cl, keys[i],
                lambda p, x, t: apply_plain(p, x, t),
            )
            loss = loss + l
            grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
        return loss / ACCUM, jax.tree.map(lambda g: g / ACCUM, grads)

    def full_batch_remat(state, image_u8, is_clean, key):
        return jax.value_and_grad(loss_for)(
            state.params, state.trigger, state.target, state.mask, image_u8, is_clean, key,
            lambda p, x, t: apply_remat({"params": p}, x, t),
        )

    def step(state, image_u8, is_clean, key):
        if variant == "scan":
            loss, grads = accum_grads_scan(state, image_u8, is_clean, key, 1)
        elif variant == "scan_u4":
            loss, grads = accum_grads_scan(state, image_u8, is_clean, key, 4)
        elif variant == "unrolled":
            loss, grads = accum_grads_unrolled(state, image_u8, is_clean, key)
        elif variant == "remat_full":
            loss, grads = full_batch_remat(state, image_u8, is_clean, key)
        else:
            raise ValueError(variant)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss

    return jax.jit(step, donate_argnums=(0,))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*",
                   default=["scan", "scan_u4", "unrolled", "remat_full"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--hbm", action="store_true", help="also trace measured HBM per step")
    args = p.parse_args()

    import dataclasses

    cfg = dataclasses.replace(DEFAULT_SCRATCH_CONFIG, sample_size=256)
    model = UNet2DModel(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda k: model.init_params(k))(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(2e-5, num_warmup_steps=10, num_training_steps=1000)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=256, batch_size=GLOBAL, fake_size=GLOBAL)
    dsl.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
    b = next(dsl.epoch_batches(0))
    img = jax.device_put(b["image_u8"])
    clean = jax.device_put(b["is_clean"])

    for variant in args.variants:
        # fresh param buffers per variant: step donates its state, so a
        # previous variant's runs consumed the shared underlying arrays
        params_i = jax.tree.map(jnp.array, params)
        state = create_train_state(params_i, optimizer, dsl.trigger, dsl.target, dsl.mask)
        step = build_step(model, optimizer, jnp.asarray(sstate.schedule.alphas),
                          jnp.asarray(sstate.schedule.alphas_cumprod), variant)
        try:
            t0 = time.time()
            state, loss = step(state, img, clean, jax.random.PRNGKey(0))
            jax.block_until_ready(loss)
            compile_s = time.time() - t0
            for i in range(2):  # warm
                state, loss = step(state, img, clean, jax.random.PRNGKey(1 + i))
            jax.block_until_ready(loss)
            best = float("inf")
            for w in range(2):
                t0 = time.perf_counter()
                for i in range(args.iters):
                    state, loss = step(state, img, clean, jax.random.PRNGKey(10 + i))
                jax.block_until_ready(loss)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            out = {"variant": variant, "step_ms": round(best * 1e3, 1),
                   "samples_per_sec": round(GLOBAL / best, 2),
                   "compile_s": round(compile_s, 1)}
            if args.hbm:
                from baddiffusion_tpu.utils.profiling import measure_hbm_traffic

                def once():
                    nonlocal state
                    state, l = step(state, img, clean, jax.random.PRNGKey(99))
                    jax.block_until_ready(l)

                h = measure_hbm_traffic(once, steps=2)
                out["hbm_gib_per_step"] = round(h["hbm_gib_per_step"], 1)
                out["hbm_gbps_busy"] = round(h["hbm_gbps_busy"], 1)
        except Exception as exc:
            out = {"variant": variant, "error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
