"""ANP (Adversarial Neuron Pruning) backdoor defense — functional form.

Behavioral contract: reference `anp_model.py` + `anp_util.py` + `anp_defense.py`:
every Conv2d is wrapped as conv + a degenerate BatchNorm (running stats fixed
to 0/1, eps=0) whose affine γ/β are the ONLY trainables
(anp_model.py:152-206,490-514; freeze + convert_model anp_util.py:60-101);
training MAXIMIZES the clean DDPM loss (loss = −p_losses with R=0,
anp_defense.py:147) with Adam over the γ/β set, grad-clip 1.0, and clamps all
perturbation params to ±perturb_budget after every step (clip_weight,
anp_defense.py:68-75); ``backdoor_mse`` monitors the model's ε-prediction on
the clean noisy input against the BACKDOOR training target
(backdoor_mse_fn, anp_defense.py:47-66).

JAX re-design (SURVEY.md §7.9): no module surgery. A degenerate BN after a
conv is algebraically ``γ·(W∗x + b) + β``, i.e. scaling the conv kernel's
output channels by γ and replacing the bias with ``γ·b + β``. So the
perturbation is a second param pytree {conv: {gamma, beta}} merged into the
UNet params on the fly — functionally identical to PerturbConv2d, verified by
the γ=1/β=0 identity test (the reference's diff_output check,
anp_util.py:103-120).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from baddiffusion_tpu.attack.loss import q_sample_backdoor, reduce_loss
from baddiffusion_tpu.data.poison import poison_batch


def init_perturb(params: Dict[str, Any]) -> Dict[str, Any]:
    """γ=1, β=0 per conv output channel, mirroring the params tree structure.

    β folds into the conv's bias (apply_perturb), so it is only allocated for
    convs that HAVE a bias — a bias-less conv cannot express an additive
    offset through merged params, and a dead β would silently receive zero
    gradient while inflating the Adam state. (Unreachable divergence from the
    reference's always-β PerturbConv2d today: every conv in the UNet2D family
    here carries a bias — models/resnet.py:247 conv_shortcut_bias defaults
    True and is never overridden.)"""

    def walk(node):
        out = {}
        for name, value in node.items():
            if isinstance(value, dict):
                sub = walk(value)
                if sub:
                    out[name] = sub
            elif name == "kernel" and value.ndim == 4:
                o = value.shape[-1]
                out["gamma"] = jnp.ones((o,), jnp.float32)
                if "bias" in node:
                    out["beta"] = jnp.zeros((o,), jnp.float32)
        return out

    return walk(params)


def apply_perturb(params: Dict[str, Any], perturb: Dict[str, Any]) -> Dict[str, Any]:
    """Merge the perturbation into the params: kernel·γ, bias·γ+β."""

    def walk(p_node, q_node):
        out = {}
        gamma = q_node.get("gamma") if isinstance(q_node, dict) else None
        for name, value in p_node.items():
            if isinstance(value, dict):
                out[name] = walk(value, q_node.get(name, {}) if isinstance(q_node, dict) else {})
            elif name == "kernel" and value.ndim == 4 and gamma is not None:
                out[name] = value * gamma.astype(value.dtype)
            elif name == "bias" and gamma is not None and value.ndim == 1 and value.shape[0] == gamma.shape[0]:
                beta = q_node.get("beta", jnp.zeros_like(gamma))
                out[name] = value * gamma.astype(value.dtype) + beta.astype(value.dtype)
            else:
                out[name] = value
        return out

    return walk(params, perturb)


def clip_perturb(perturb: Dict[str, Any], budget: Optional[float]) -> Dict[str, Any]:
    """Clamp every perturbation parameter to ±budget (reference clip_weight,
    anp_defense.py:68-75)."""
    if budget is None or budget < 0:
        return perturb
    return jax.tree.map(lambda p: jnp.clip(p, -budget, budget), perturb)


def perturbed_apply_fn(model) -> Callable:
    """apply(params, perturb, x, t) with the perturbation merged in."""

    def apply_fn(params, perturb, x, t):
        return model.apply({"params": apply_perturb(params, perturb)}, x, t)

    return apply_fn


def make_anp_step(
    model,
    optimizer: optax.GradientTransformation,
    num_train_timesteps: int,
    alphas: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    perturb_budget: float = 4.0,
    vmin: float = -1.0,
    vmax: float = 1.0,
    mesh=None,
) -> Callable:
    """Build the jitted ANP step.

    step(params, perturb, opt_state, image_u8, is_clean, trigger, target,
         mask, key) -> (perturb, opt_state, metrics)
    The batch arrives fully poisoned (clean_rate=0, poison_rate=1 —
    anp_util.py:149), so ``image`` is the clean image, ``pixel_values`` the
    trigger composite and ``target`` the backdoor target.
    """
    apply_fn = perturbed_apply_fn(model)
    alphas = jnp.asarray(alphas)
    alphas_cumprod = jnp.asarray(alphas_cumprod)

    def losses(perturb, params, image, R_trigger, backdoor_target, t, noise):
        zero_R = jnp.zeros_like(image)
        x_noisy, clean_target = q_sample_backdoor(alphas, alphas_cumprod, image, zero_R, t, noise)
        pred = apply_fn(params, perturb, x_noisy, t)
        clean_loss = reduce_loss(pred, clean_target, "l2")
        # diagnostic: same prediction against the backdoor training target
        _, bd_target = q_sample_backdoor(alphas, alphas_cumprod, backdoor_target, R_trigger, t, noise)
        backdoor_mse = reduce_loss(pred, bd_target, "l2")
        return -clean_loss, (clean_loss, backdoor_mse)

    def step(params, perturb, opt_state, image_u8, is_clean, trigger, target, mask, key):
        image, R, tgt = poison_batch(image_u8, is_clean, trigger, target, mask, vmin, vmax)
        k_t, k_eps = jax.random.split(key)
        b = image_u8.shape[0]
        t = jax.random.randint(k_t, (b,), 0, num_train_timesteps)
        noise = jax.random.normal(k_eps, image.shape, jnp.float32)

        (loss, (clean_loss, backdoor_mse)), grads = jax.value_and_grad(losses, has_aux=True)(
            perturb, params, image, R, tgt, t, noise
        )
        updates, opt_state = optimizer.update(grads, opt_state, perturb)
        perturb = optax.apply_updates(perturb, updates)
        perturb = clip_perturb(perturb, perturb_budget)
        metrics = {"loss": loss, "clean_mse": clean_loss, "backdoor_mse": backdoor_mse}
        return perturb, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from baddiffusion_tpu.parallel.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    data4 = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    data1 = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(None, None, None, data4, data1, repl, repl, repl, repl),
        out_shardings=(None, None, repl),
    )
