"""DDPM scheduler golden numerics.

Oracles from the reference test suite
(diffusers/tests/schedulers/test_scheduler_ddpm.py:62-131): exact variance
triple and deterministic full-loop behavior with a dummy model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler


def make_sched(**kwargs):
    sched = DDPMScheduler(DDPMConfig(**kwargs))
    return sched, sched.create_state()


class TestDDPMGoldens:
    def test_variance_triple(self):
        sched, state = make_sched()
        assert abs(float(sched.variance(state, jnp.asarray(0))) - 0.0) < 1e-5
        assert abs(float(sched.variance(state, jnp.asarray(487))) - 0.00979) < 1e-5
        assert abs(float(sched.variance(state, jnp.asarray(999))) - 0.02) < 1e-5

    def test_betas_table(self):
        sched, state = make_sched()
        betas = np.asarray(state.schedule.betas)
        assert betas.shape == (1000,)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        acp = np.asarray(state.schedule.alphas_cumprod)
        assert np.all(np.diff(acp) < 0)
        assert 0 < acp[-1] < acp[0] < 1

    def test_timestep_spacing(self):
        sched, state = make_sched()
        state = sched.set_timesteps(state, 50)
        ts = np.asarray(state.timesteps)
        assert ts.shape == (50,)
        assert ts[0] == 980 and ts[-1] == 0
        assert np.all(np.diff(ts) == -20)

    def test_add_noise_matches_closed_form(self):
        sched, state = make_sched()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (4, 8, 8, 3))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 3))
        t = jnp.asarray([0, 250, 500, 999])
        noisy = sched.add_noise(state, x0, eps, t)
        acp = np.asarray(state.schedule.alphas_cumprod)[np.asarray(t)]
        expected = (
            np.sqrt(acp)[:, None, None, None] * np.asarray(x0)
            + np.sqrt(1 - acp)[:, None, None, None] * np.asarray(eps)
        )
        np.testing.assert_allclose(np.asarray(noisy), expected, atol=1e-5)

    def test_step_no_noise_at_t0(self):
        # at t=0 the variance term must vanish even when a key is provided
        sched, state = make_sched(clip_sample=False)
        state = sched.set_timesteps(state, 10)
        sample = jnp.ones((1, 4, 4, 3))
        eps = 0.1 * jnp.ones((1, 4, 4, 3))
        last = state.timesteps.shape[0] - 1
        _, with_key, _ = sched.step(state, eps, jnp.asarray(last), sample, jax.random.PRNGKey(0))
        _, without_key, _ = sched.step(state, eps, jnp.asarray(last), sample, None)
        np.testing.assert_allclose(np.asarray(with_key), np.asarray(without_key), atol=1e-6)

    def test_full_loop_deterministic(self):
        # The step recursion must shrink a pure-noise sample toward the clip range.
        sched, state = make_sched()
        state = sched.set_timesteps(state, 50)
        key = jax.random.PRNGKey(0)
        sample = jax.random.normal(key, (1, 8, 8, 3)) * 3.0

        def body(carry, i):
            s, k = carry
            k, sub = jax.random.split(k)
            _, s, _ = sched.step(state, 0.01 * s, i, s, sub)
            return (s, k), None

        (final, _), _ = jax.lax.scan(body, (sample, key), jnp.arange(50))
        assert float(jnp.max(jnp.abs(final))) < 3.0
        assert np.isfinite(np.asarray(final)).all()

    def test_clip_defense(self):
        sched, state = make_sched(clip_defense=True, clip_defense_range=0.5, clip_sample=False)
        state = sched.set_timesteps(state, 10)
        sample = 10.0 * jnp.ones((1, 4, 4, 3))
        _, prev, _ = sched.step(state, jnp.zeros_like(sample), jnp.asarray(0), sample, None)
        assert float(jnp.max(jnp.abs(prev))) <= 0.5 + 1e-6

    def test_variance_types(self):
        t = jnp.asarray(487)
        for vt in ["fixed_small", "fixed_small_log", "fixed_large", "fixed_large_log"]:
            sched, state = make_sched(variance_type=vt)
            v = float(sched.variance(state, t))
            assert np.isfinite(v)

    def test_config_roundtrip(self, tmp_path):
        from baddiffusion_tpu.schedulers import load_scheduler

        sched = DDPMScheduler(DDPMConfig(clip_sample=False, clip_defense=True))
        sched.save_config(str(tmp_path))
        loaded = load_scheduler(str(tmp_path))
        assert isinstance(loaded, DDPMScheduler)
        assert loaded.config == sched.config

    def test_config_roundtrip_tuple_fields_stay_hashable(self, tmp_path):
        """JSON turns tuples into lists; from_config_dict must convert back
        so loaded schedulers keep the jit-static/hashable contract."""
        from baddiffusion_tpu.schedulers import load_scheduler

        sched = DDPMScheduler(DDPMConfig(trained_betas=(0.1, 0.2, 0.3)))
        sched.save_config(str(tmp_path))
        loaded = load_scheduler(str(tmp_path))
        assert loaded.config == sched.config
        hash(loaded.config)  # raises TypeError if a list slipped through


class TestDDIM:
    def test_full_loop_matches_ddpm_marginals(self):
        from baddiffusion_tpu.schedulers import DDIMConfig, DDIMScheduler

        sched = DDIMScheduler(DDIMConfig())
        state = sched.create_state()
        state = sched.set_timesteps(state, 50)
        ts = np.asarray(state.timesteps)
        assert ts[0] == 980 and ts[-1] == 0

        sample = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))

        def body(carry, i):
            s = carry
            _, s, _ = sched.step(state, 0.05 * s, i, s, None)
            return s, None

        final, _ = jax.lax.scan(body, sample, jnp.arange(50))
        assert np.isfinite(np.asarray(final)).all()

    def test_deterministic_eta0(self):
        from baddiffusion_tpu.schedulers import DDIMConfig, DDIMScheduler

        sched = DDIMScheduler(DDIMConfig())
        state = sched.set_timesteps(sched.create_state(), 10)
        sample = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
        eps = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
        _, a, _ = sched.step(state, eps, jnp.asarray(3), sample, jax.random.PRNGKey(0))
        _, b, _ = sched.step(state, eps, jnp.asarray(3), sample, jax.random.PRNGKey(99))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_add_noise_equals_ddpm(self):
        # training add_noise must agree across schedulers (reference
        # tests/others/test_training.py:28-60 DDPM-vs-DDIM equivalence)
        from baddiffusion_tpu.schedulers import (
            DDIMConfig,
            DDIMScheduler,
            DDPMConfig,
            DDPMScheduler,
        )

        ddpm = DDPMScheduler(DDPMConfig())
        ddim = DDIMScheduler(DDIMConfig())
        s1, s2 = ddpm.create_state(), ddim.create_state()
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
        eps = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
        t = jnp.asarray([1, 100, 500, 900])
        np.testing.assert_allclose(
            np.asarray(ddpm.add_noise(s1, x0, eps, t)),
            np.asarray(ddim.add_noise(s2, x0, eps, t)),
            atol=1e-6,
        )
