"""Full-loop numerical parity of every solver scheduler vs the vendored torch
reference, with a deterministic stand-in denoiser.

This is the strongest scheduler oracle available offline: identical init +
identical fake model ⇒ the whole reverse chain must match step-for-step
(tolerance covers f32 accumulation-order differences only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SHAPE = (2, 8, 8, 3)  # NHWC here; NCHW on the torch side


def fake_model_np(sample_nhwc: np.ndarray, t: float) -> np.ndarray:
    # smooth, t-dependent, deterministic; keeps values in a sane range
    return 0.1 * sample_nhwc + np.float32(np.sin(t / 100.0)) * 0.05


def run_reference(sched_name: str, kwargs: dict, num_steps: int) -> np.ndarray:
    import torch

    from tests.reference_utils import import_reference_diffusers

    diffusers = import_reference_diffusers()
    cls = getattr(diffusers, sched_name)
    sched = cls(num_train_timesteps=1000, beta_start=0.0001, beta_end=0.02, **kwargs)
    sched.set_timesteps(num_steps)
    rng = np.random.RandomState(0)
    sample = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32).transpose(0, 3, 1, 2))
    sample = sample * sched.init_noise_sigma
    for t in sched.timesteps:
        model_in = sched.scale_model_input(sample, t)
        eps_nhwc = fake_model_np(model_in.numpy().transpose(0, 2, 3, 1), float(t))
        eps = torch.from_numpy(eps_nhwc.transpose(0, 3, 1, 2))
        sample = sched.step(eps, t, sample).prev_sample
    return sample.numpy().transpose(0, 2, 3, 1)


def run_ours(sched, num_steps: int) -> np.ndarray:
    state = sched.set_timesteps(sched.create_state(), num_steps)
    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.randn(*SHAPE).astype(np.float32))

    from baddiffusion_tpu.pipelines.sampler import sample_loop

    def apply_fn(params, x, t):
        # t arrives as a broadcast [B] array; all entries equal
        return 0.1 * x + jnp.sin(t[0].astype(jnp.float32) / 100.0) * 0.05

    final, _ = sample_loop(sched, state, apply_fn, None, init, jax.random.PRNGKey(0))
    return np.asarray(final)


def dpm_cases():
    cases = []
    for order in (1, 2, 3):
        for algo in ("dpmsolver", "dpmsolver++"):
            cases.append(
                pytest.param(
                    "DPMSolverMultistepScheduler",
                    {"solver_order": order, "algorithm_type": algo},
                    id=f"dpm-{algo}-o{order}",
                )
            )
    return cases


@pytest.mark.reference
class TestSolverParity:
    @pytest.mark.parametrize("torch_name,kwargs", dpm_cases())
    @pytest.mark.parametrize("num_steps", [10, 20])
    def test_dpm_solver(self, torch_name, kwargs, num_steps):
        from baddiffusion_tpu.schedulers import DPMSolverConfig, DPMSolverMultistepScheduler

        ref = run_reference(torch_name, kwargs, num_steps)
        ours = run_ours(DPMSolverMultistepScheduler(DPMSolverConfig(**kwargs)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    @pytest.mark.parametrize("num_steps", [10, 50])
    def test_ddim(self, num_steps):
        from baddiffusion_tpu.schedulers import DDIMConfig, DDIMScheduler

        ref = run_reference("DDIMScheduler", {}, num_steps)
        ours = run_ours(DDIMScheduler(DDIMConfig()), num_steps)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    @pytest.mark.parametrize("num_steps", [10, 50])
    def test_ddpm_deterministic_mean(self, num_steps):
        # variance noise differs (torch vs jax RNG); compare with a fixed
        # zero-noise path by exploiting t=0 non-noising is not enough — so use
        # clip_sample=False and strip noise via variance_type comparison at
        # the mean level: run torch with a zeroed generator noise is not
        # possible; instead compare one noiseless step exactly.
        import torch

        from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        ref_sched = diffusers.DDPMScheduler(num_train_timesteps=1000)
        ref_sched.set_timesteps(num_steps)
        ours = DDPMScheduler(DDPMConfig())
        state = ours.set_timesteps(ours.create_state(), num_steps)

        rng = np.random.RandomState(0)
        sample = rng.randn(*SHAPE).astype(np.float32)
        eps = fake_model_np(sample, float(ref_sched.timesteps[3]))
        t = ref_sched.timesteps[3]
        # torch step at t=last is noiseless only at t==0; pick index such that
        # torch variance noise is added — so compare pred_original + mean via
        # the noiseless branch: use t=0 (the final timestep entry)
        t0 = ref_sched.timesteps[-1]
        eps0 = fake_model_np(sample, float(t0))
        ref_prev = ref_sched.step(
            torch.from_numpy(eps0.transpose(0, 3, 1, 2)), t0,
            torch.from_numpy(sample.transpose(0, 3, 1, 2)),
        ).prev_sample.numpy().transpose(0, 2, 3, 1)
        _, our_prev, _ = ours.step(
            state, jnp.asarray(eps0), jnp.asarray(num_steps - 1), jnp.asarray(sample), None
        )
        np.testing.assert_allclose(np.asarray(our_prev), ref_prev, atol=5e-5, rtol=1e-4)


@pytest.mark.reference
class TestUniPCParity:
    @pytest.mark.parametrize("order", [1, 2, 3])
    @pytest.mark.parametrize("solver_type", ["bh1", "bh2"])
    @pytest.mark.parametrize("num_steps", [10, 20])
    def test_unipc(self, order, solver_type, num_steps):
        from baddiffusion_tpu.schedulers import UniPCConfig, UniPCMultistepScheduler

        kwargs = {"solver_order": order, "solver_type": solver_type}
        ref = run_reference("UniPCMultistepScheduler", kwargs, num_steps)
        ours = run_ours(UniPCMultistepScheduler(UniPCConfig(**kwargs)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_unipc_predict_eps(self):
        from baddiffusion_tpu.schedulers import UniPCConfig, UniPCMultistepScheduler

        kwargs = {"predict_x0": False}
        ref = run_reference("UniPCMultistepScheduler", kwargs, 15)
        ours = run_ours(UniPCMultistepScheduler(UniPCConfig(**kwargs)), 15)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.reference
class TestDEISParity:
    @pytest.mark.parametrize("order", [1, 2, 3])
    @pytest.mark.parametrize("num_steps", [10, 20])
    def test_deis(self, order, num_steps):
        from baddiffusion_tpu.schedulers import DEISConfig, DEISMultistepScheduler

        kwargs = {"solver_order": order}
        ref = run_reference("DEISMultistepScheduler", kwargs, num_steps)
        ours = run_ours(DEISMultistepScheduler(DEISConfig(**kwargs)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.reference
class TestPNDMParity:
    @pytest.mark.parametrize("skip_prk", [False, True])
    @pytest.mark.parametrize("num_steps", [10, 50])
    def test_pndm(self, skip_prk, num_steps):
        from baddiffusion_tpu.schedulers import PNDMConfig, PNDMScheduler

        kwargs = {"skip_prk_steps": skip_prk}
        ref = run_reference("PNDMScheduler", kwargs, num_steps)
        ours = run_ours(PNDMScheduler(PNDMConfig(**kwargs)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.reference
class TestHeunLMSParity:
    @pytest.mark.parametrize("num_steps", [10, 25])
    def test_heun(self, num_steps):
        from baddiffusion_tpu.schedulers import HeunConfig, HeunDiscreteScheduler

        kwargs = {"beta_start": 0.0001, "beta_end": 0.02}
        ref = run_reference("HeunDiscreteScheduler", {}, num_steps)
        ours = run_ours(HeunDiscreteScheduler(HeunConfig(beta_start=0.0001, beta_end=0.02)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    @pytest.mark.parametrize("num_steps", [10, 25])
    def test_lms(self, num_steps):
        from baddiffusion_tpu.schedulers import LMSConfig, LMSDiscreteScheduler

        ref = run_reference("LMSDiscreteScheduler", {}, num_steps)
        ours = run_ours(LMSDiscreteScheduler(LMSConfig(beta_start=0.0001, beta_end=0.02)), num_steps)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.reference
class TestSdeVeParity:
    def test_sde_ve_deterministic_mean(self):
        # predictor mean path (no RNG dependence): compare prev_sample_mean
        # step-by-step with zeroed torch noise is impossible through the public
        # API, so compare the drift-only mean of single steps.
        import torch

        from baddiffusion_tpu.schedulers import ScoreSdeVeConfig, ScoreSdeVeScheduler
        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        ref = diffusers.ScoreSdeVeScheduler()
        n = 20
        ref.set_timesteps(n)
        ref.set_sigmas(n)
        ours = ScoreSdeVeScheduler(ScoreSdeVeConfig())
        state = ours.set_timesteps(None, n)

        np.testing.assert_allclose(np.asarray(state.timesteps), ref.timesteps.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.sigmas), ref.sigmas.numpy(), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(state.discrete_sigmas), ref.discrete_sigmas.numpy(), rtol=1e-4
        )

        rng = np.random.RandomState(0)
        sample = rng.randn(*SHAPE).astype(np.float32)
        score = (0.001 * rng.randn(*SHAPE)).astype(np.float32)
        for i in (0, 7, n - 1):
            t = ref.timesteps[i]
            ref_out = ref.step_pred(
                torch.from_numpy(score.transpose(0, 3, 1, 2)), t,
                torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                generator=torch.manual_seed(0),
            )
            _, _, our_mean = ours.step_pred(
                state, jnp.asarray(score), jnp.asarray(i), jnp.asarray(sample),
                jax.random.PRNGKey(0),
            )
            np.testing.assert_allclose(
                np.asarray(our_mean),
                ref_out.prev_sample_mean.numpy().transpose(0, 2, 3, 1),
                atol=1e-2, rtol=1e-3,
            )


@pytest.mark.reference
class TestKarrasVeParity:
    def test_step_functions(self):
        import torch

        from baddiffusion_tpu.schedulers import KarrasVeConfig, KarrasVeScheduler
        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        ref = diffusers.KarrasVeScheduler()
        n = 20
        ref.set_timesteps(n)
        ours = KarrasVeScheduler(KarrasVeConfig())
        state = ours.set_timesteps(None, n)
        np.testing.assert_allclose(np.asarray(state.schedule), ref.schedule.numpy(), rtol=1e-5)

        rng = np.random.RandomState(0)
        sample_hat = rng.randn(*SHAPE).astype(np.float32)
        mo = (0.01 * rng.randn(*SHAPE)).astype(np.float32)
        sigma_hat, sigma_prev = float(ref.schedule[3]), float(ref.schedule[4])
        ref_out = ref.step(
            torch.from_numpy(mo.transpose(0, 3, 1, 2)), sigma_hat, sigma_prev,
            torch.from_numpy(sample_hat.transpose(0, 3, 1, 2)),
        )
        prev, deriv, _ = ours.step(state, jnp.asarray(mo), sigma_hat, sigma_prev, jnp.asarray(sample_hat))
        np.testing.assert_allclose(
            np.asarray(prev), ref_out.prev_sample.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
        )
        ref_corr = ref.step_correct(
            torch.from_numpy(mo.transpose(0, 3, 1, 2)), sigma_hat, sigma_prev,
            torch.from_numpy(sample_hat.transpose(0, 3, 1, 2)),
            ref_out.prev_sample, ref_out.derivative,
        )
        corr, _, _ = ours.step_correct(
            state, jnp.asarray(mo), sigma_hat, sigma_prev, jnp.asarray(sample_hat), prev, deriv
        )
        np.testing.assert_allclose(
            np.asarray(corr), ref_corr.prev_sample.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
        )


@pytest.mark.reference
class TestDDPMFullChainParity:
    def test_ancestral_chain_with_injected_noise(self):
        """Run the reference DDPMScheduler chain with torch RNG, capture its
        variance noises, and replay OUR chain with the same noises — the full
        ancestral recursion must match step-for-step."""
        import torch

        from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        n = 20
        ref = diffusers.DDPMScheduler(num_train_timesteps=1000)
        ref.set_timesteps(n)
        ours = DDPMScheduler(DDPMConfig())
        state = ours.set_timesteps(ours.create_state(), n)

        rng = np.random.RandomState(0)
        sample_t = torch.from_numpy(rng.randn(*SHAPE).astype(np.float32).transpose(0, 3, 1, 2))
        sample_j = jnp.asarray(sample_t.numpy().transpose(0, 2, 3, 1))

        gen = torch.manual_seed(1234)
        for i, t in enumerate(ref.timesteps):
            eps = fake_model_np(sample_t.numpy().transpose(0, 2, 3, 1), float(t))
            eps_t = torch.from_numpy(eps.transpose(0, 3, 1, 2))
            # capture the exact noise torch will draw by cloning the generator state
            gstate = gen.get_state()
            noise_t = torch.empty(sample_t.shape).normal_(generator=gen)
            gen.set_state(gstate)
            sample_t = ref.step(eps_t, t, sample_t, generator=gen).prev_sample

            # our mean path + the captured noise
            _, mean_j, _ = ours.step(state, jnp.asarray(eps), jnp.asarray(i), sample_j, None)
            sigma = jnp.sqrt(ours.variance(state, jnp.asarray(int(t))))
            noise_j = jnp.asarray(noise_t.numpy().transpose(0, 2, 3, 1))
            sample_j = jnp.where(int(t) > 0, mean_j + sigma * noise_j, mean_j)

            np.testing.assert_allclose(
                np.asarray(sample_j),
                sample_t.numpy().transpose(0, 2, 3, 1),
                atol=1e-3, rtol=1e-3,
                err_msg=f"diverged at step {i} (t={int(t)})",
            )
