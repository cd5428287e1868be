"""Backdoor loss math: closed-form oracles + parity vs the reference formulas.

The R_coef identity and the clean-degeneration property (R=0 ⇒ vanilla DDPM
loss) are the cheap exact oracles from SURVEY.md §6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu.attack import backdoor_loss, q_sample_backdoor
from baddiffusion_tpu.attack.loss import reduce_loss
from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler


@pytest.fixture(scope="module")
def sched_state():
    sched = DDPMScheduler(DDPMConfig())
    return sched, sched.create_state()


def test_q_sample_matches_reference_formula(sched_state):
    sched, state = sched_state
    alphas = np.asarray(state.schedule.alphas)
    acp = np.asarray(state.schedule.alphas_cumprod)
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 8, 8, 3).astype(np.float32)
    R = rng.randn(4, 8, 8, 3).astype(np.float32)
    eps = rng.randn(4, 8, 8, 3).astype(np.float32)
    t = np.asarray([0, 100, 500, 999])

    x_noisy, target = q_sample_backdoor(
        state.schedule.alphas, state.schedule.alphas_cumprod,
        jnp.asarray(x0), jnp.asarray(R), jnp.asarray(t), jnp.asarray(eps),
    )
    # reference loss.py:264-285 computed in numpy
    sa = np.sqrt(acp[t])[:, None, None, None]
    so = np.sqrt(1 - acp[t])[:, None, None, None]
    rc = ((1 - np.sqrt(alphas[t])) * np.sqrt(1 - acp[t]) / (1 - alphas[t]))[:, None, None, None]
    np.testing.assert_allclose(np.asarray(x_noisy), sa * x0 + so * eps + (1 - sa) * R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(target), rc * R + eps, atol=1e-4)


def test_r_coef_golden_values(sched_state):
    # R_coef_t = (1-sqrt(alpha_t)) * sqrt(1-acp_t) / (1-alpha_t); exact values
    # derived from the linear beta table (T=1000, 1e-4 -> 0.02)
    _, state = sched_state
    alphas = np.asarray(state.schedule.alphas, dtype=np.float64)
    acp = np.asarray(state.schedule.alphas_cumprod, dtype=np.float64)
    for t in (0, 487, 999):
        expected = (1 - np.sqrt(alphas[t])) * np.sqrt(1 - acp[t]) / (1 - alphas[t])
        x0 = jnp.zeros((1, 2, 2, 1))
        R = jnp.ones((1, 2, 2, 1))
        eps = jnp.zeros((1, 2, 2, 1))
        _, target = q_sample_backdoor(
            state.schedule.alphas, state.schedule.alphas_cumprod, x0, R, jnp.asarray([t]), eps
        )
        assert float(target[0, 0, 0, 0]) == pytest.approx(expected, abs=1e-5)


def test_clean_rows_degenerate_to_ddpm(sched_state):
    # R=0 => x_noisy == scheduler.add_noise, target == eps
    sched, state = sched_state
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    t = jnp.asarray([3, 30, 300, 900])
    x_noisy, target = q_sample_backdoor(
        state.schedule.alphas, state.schedule.alphas_cumprod, x0, jnp.zeros_like(x0), t, eps
    )
    np.testing.assert_allclose(np.asarray(x_noisy), np.asarray(sched.add_noise(state, x0, eps, t)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), np.asarray(eps), atol=1e-6)


def test_loss_reductions_match_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    a = rng.randn(32, 7).astype(np.float32)
    b = rng.randn(32, 7).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    assert float(reduce_loss(jnp.asarray(a), jnp.asarray(b), "l2")) == pytest.approx(
        float(F.mse_loss(tb, ta)), rel=1e-6
    )
    assert float(reduce_loss(jnp.asarray(a), jnp.asarray(b), "l1")) == pytest.approx(
        float(F.l1_loss(tb, ta)), rel=1e-6
    )
    assert float(reduce_loss(jnp.asarray(a), jnp.asarray(b), "huber")) == pytest.approx(
        float(F.smooth_l1_loss(tb, ta)), rel=1e-6
    )


def test_backdoor_loss_grad_flows(sched_state):
    sched, state = sched_state
    w0 = jnp.ones((3, 3))

    def apply_fn(params, x, t):
        return x * params["w"].mean()

    def loss_fn(params):
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        return backdoor_loss(
            apply_fn, params, state.schedule.alphas, state.schedule.alphas_cumprod,
            x0, jnp.zeros_like(x0), jnp.asarray([10, 500]),
            jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 3)),
        )

    g = jax.grad(loss_fn)({"w": w0})
    assert np.isfinite(np.asarray(g["w"])).all()
    assert float(jnp.abs(g["w"]).sum()) > 0
