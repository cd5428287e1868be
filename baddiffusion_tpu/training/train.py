"""The training hot loop as one SPMD program.

Behavioral contract: reference step body (baddiffusion.py:590-622): draw
ε∼N(0,I) and t∼U[0,T), compute `p_losses_diffuser(x_start=target,
R=pixel_values)`, backward, clip grad-norm 1.0, Adam step, cosine LR step.

TPU-native design:
  - poison compositing + q-sample + UNet fwd/bwd + optimizer update compile
    into ONE jitted XLA program; batch is sharded over the ``data`` mesh axis
    and XLA emits the gradient all-reduce over ICI from the shardings alone.
  - gradient accumulation (baddiffusion.py:217,605 — how the reference reaches
    global batch 128/64 on small devices) is a `lax.scan` over micro-batches
    inside the same program.
  - params live in f32; the UNet computes in bf16 (model dtype); loss/grads
    reduce in f32. No loss-scaling needed on TPU (vs the reference's fp16
    GradScaler, baddiffusion.py:275).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from baddiffusion_tpu.attack.loss import backdoor_loss
from baddiffusion_tpu.data.poison import poison_batch
from baddiffusion_tpu.parallel.mesh import DATA_AXIS


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # poisoning constants (device-resident, HWC)
    trigger: jnp.ndarray
    target: jnp.ndarray
    mask: jnp.ndarray


def create_train_state(params, optimizer, trigger, target, mask) -> TrainState:
    import numpy as np

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        trigger=jnp.asarray(np.asarray(trigger)),
        target=jnp.asarray(np.asarray(target)),
        mask=jnp.asarray(np.asarray(mask)),
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    num_train_timesteps: int,
    alphas: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    loss_type: str = "l2",
    grad_accum: int = 1,
    mesh=None,
    vmin: float = -1.0,
    vmax: float = 1.0,
    use_remat: bool = False,
    state_shardings=None,
) -> Callable:
    """Build the jitted train step.

    step(state, image_u8 [B,H,W,C] uint8, is_clean [B] bool, key) ->
        (state, metrics dict)

    With ``grad_accum=k``, B must be k·micro and the micro-steps scan inside.

    ``state_shardings`` (a NamedSharding pytree matching TrainState) pins the
    state's layout on BOTH sides of the step. Without it, GSPMD may choose
    an output layout that differs from the input layout on a composed
    (TP × FSDP) mesh — then step 0 and the steady state are two different
    programs with different reduction orders, which breaks bitwise
    resume-equality and silently compiles twice. Left None, the step infers
    layouts from its arguments (one step can then serve several layouts —
    the dryrun uses this).
    """
    apply = model.apply
    if use_remat:
        # rematerialize the UNet forward during backprop: trades FLOPs for HBM
        apply = jax.checkpoint(model.apply)

    def apply_fn(params, x, t):
        return apply({"params": params}, x, t)

    alphas = jnp.asarray(alphas)
    alphas_cumprod = jnp.asarray(alphas_cumprod)

    def loss_for(params, trigger, target, mask, image_u8, is_clean, key):
        image, R, x_start = poison_batch(image_u8, is_clean, trigger, target, mask, vmin, vmax)
        k_t, k_eps = jax.random.split(key)
        b = image_u8.shape[0]
        t = jax.random.randint(k_t, (b,), 0, num_train_timesteps)
        noise = jax.random.normal(k_eps, x_start.shape, jnp.float32)
        return backdoor_loss(
            apply_fn, params, alphas, alphas_cumprod, x_start, R, t, noise, loss_type
        )

    def train_step(state: TrainState, image_u8, is_clean, key):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_for)(
                state.params, state.trigger, state.target, state.mask, image_u8, is_clean, key
            )
        else:
            micro = image_u8.shape[0] // grad_accum
            imgs = image_u8.reshape((grad_accum, micro) + image_u8.shape[1:])
            clean = is_clean.reshape((grad_accum, micro))
            keys = jax.random.split(key, grad_accum)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                img, cl, k = xs
                l, g = jax.value_and_grad(loss_for)(
                    state.params, state.trigger, state.target, state.mask, img, cl, k
                )
                return (loss_acc + l, jax.tree.map(jnp.add, grad_acc, g)), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(body, (0.0, zero_grads), (imgs, clean, keys))
            loss = loss / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data4 = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    data1 = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(state_shardings, data4, data1, repl),
        out_shardings=(state_shardings, repl),
    )
