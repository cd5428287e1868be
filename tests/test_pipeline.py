"""Sampling engine + pipeline tests with a seeded tiny UNet.

Mirrors the reference's fast pipeline tests
(diffusers/tests/pipelines/ddpm/test_ddpm.py:28-89: tiny UNet, few steps,
deterministic given seeds), plus the BadDiffusion hooks: init latent,
trajectory capture, start_from, per-step clipping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
from baddiffusion_tpu.pipelines import DiffusionPipeline, batch_sampling, batch_sampling_save
from baddiffusion_tpu.schedulers import DDIMConfig, DDIMScheduler, DDPMConfig, DDPMScheduler

TINY = UNet2DConfig(
    sample_size=8,
    in_channels=3,
    out_channels=3,
    layers_per_block=1,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    norm_num_groups=4,
    attention_head_dim=4,
)


@pytest.fixture(scope="module")
def pipe():
    model = UNet2DModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    return DiffusionPipeline(model, params, sched, default_inference_steps=10)


class TestPipeline:
    def test_basic_sampling(self, pipe):
        out = pipe(batch_size=2, key=jax.random.PRNGKey(0), num_inference_steps=5)
        assert out.images.shape == (2, 8, 8, 3)
        assert out.images.min() >= 0.0 and out.images.max() <= 1.0

    def test_deterministic_given_key(self, pipe):
        a = pipe(batch_size=2, key=jax.random.PRNGKey(7), num_inference_steps=5).images
        b = pipe(batch_size=2, key=jax.random.PRNGKey(7), num_inference_steps=5).images
        np.testing.assert_array_equal(a, b)
        c = pipe(batch_size=2, key=jax.random.PRNGKey(8), num_inference_steps=5).images
        assert np.abs(a - c).max() > 0

    def test_init_latent_controls_output(self, pipe):
        # the backdoor activation path: caller-supplied initial latent
        init1 = np.zeros((2, 8, 8, 3), np.float32)
        init2 = np.ones((2, 8, 8, 3), np.float32)
        k = jax.random.PRNGKey(0)
        a = pipe(init=init1, key=k, num_inference_steps=5).images
        b = pipe(init=init2, key=k, num_inference_steps=5).images
        assert np.abs(a - b).max() > 1e-4

    def test_movie_capture(self, pipe):
        out = pipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=10,
                   save_every_step=True, capture_every=2)
        assert out.movie is not None
        assert out.movie.shape == (5, 1, 8, 8, 3)
        assert out.movie.min() >= 0.0 and out.movie.max() <= 1.0
        # final frame of movie == final image, exactly
        np.testing.assert_allclose(out.movie[-1], out.images, atol=1e-6)

    def test_movie_last_frame_is_final_even_off_stride(self, pipe):
        """When (n_steps-1) isn't a stride multiple (n=10, stride=3 captures
        offsets 0,3,6,9→ wait, 9 IS the final; use stride 4: offsets 0,4,8 —
        final offset 9 off-stride), the last slot must still hold the FINAL
        sample, not the last strided intermediate."""
        out = pipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=10,
                   save_every_step=True, capture_every=4)
        assert out.movie.shape == (3, 1, 8, 8, 3)
        np.testing.assert_allclose(out.movie[-1], out.images, atol=1e-6)

    def test_start_from(self, pipe):
        out = pipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=10, start_from=5)
        assert out.images.shape == (1, 8, 8, 3)

    def test_clip_each_step(self, pipe):
        clipped = DiffusionPipeline(pipe.unet, pipe.params, pipe.scheduler, clip_each_step=0.1)
        out = clipped(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=5)
        # x in [-0.1, 0.1] -> images in [0.45, 0.55]
        assert out.images.min() >= 0.45 - 1e-5 and out.images.max() <= 0.55 + 1e-5

    def test_ddim_pipeline(self, pipe):
        ddim = DiffusionPipeline(
            pipe.unet, pipe.params, DDIMScheduler(DDIMConfig()), default_inference_steps=10
        )
        out = ddim(batch_size=2, key=jax.random.PRNGKey(0))
        assert out.images.shape == (2, 8, 8, 3)
        assert np.isfinite(out.images).all()

    def test_batch_sampling_split(self, pipe):
        imgs = batch_sampling(5, pipe, max_batch_n=2, num_inference_steps=3)
        assert imgs.shape == (5, 8, 8, 3)

    def test_batch_sampling_save(self, pipe, tmp_path):
        import os

        init = np.random.RandomState(0).randn(3, 8, 8, 3).astype(np.float32)
        batch_sampling_save(3, pipe, str(tmp_path), init=init, max_batch_n=2, num_inference_steps=3)
        files = sorted(os.listdir(tmp_path))
        assert files == ["0.png", "1.png", "2.png"]

    @pytest.mark.parametrize("shard_count", [2, 3])
    def test_batch_sampling_save_sharded_matches_single(self, pipe, tmp_path, shard_count):
        """The union of all shards' outputs is byte-identical to an unsharded
        run for any shard_count (the pod-measure invariance run_measure relies
        on): global chunk indices key the PRNG and the filename offsets."""
        import os

        init = np.random.RandomState(1).randn(7, 8, 8, 3).astype(np.float32)
        single, sharded = tmp_path / "single", tmp_path / "sharded"
        kw = dict(init=init, max_batch_n=2, num_inference_steps=3, key=jax.random.PRNGKey(3))
        batch_sampling_save(7, pipe, str(single), **kw)
        for s in range(shard_count):
            batch_sampling_save(7, pipe, str(sharded), shard_index=s, shard_count=shard_count, **kw)
        names = sorted(os.listdir(single))
        assert sorted(os.listdir(sharded)) == names == [f"{i}.png" for i in range(7)]
        for n in names:
            assert (single / n).read_bytes() == (sharded / n).read_bytes(), n

    def test_save_load_roundtrip(self, pipe, tmp_path):
        pipe.save_pretrained(str(tmp_path))
        import os

        assert set(os.listdir(tmp_path)) >= {"model_index.json", "unet", "scheduler"}
        loaded = DiffusionPipeline.from_pretrained(str(tmp_path))
        k = jax.random.PRNGKey(3)
        a = pipe(batch_size=1, key=k, num_inference_steps=3).images
        b = loaded(batch_size=1, key=k, num_inference_steps=3).images
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sde_ve_pipeline_branch(pipe):
    # predictor-corrector branch of the pipeline (reference ScoreSdeVePipeline)
    from baddiffusion_tpu.schedulers import ScoreSdeVeConfig, ScoreSdeVeScheduler

    sde = DiffusionPipeline(
        pipe.unet, pipe.params, ScoreSdeVeScheduler(ScoreSdeVeConfig()),
        default_inference_steps=8, hf_class_name="ScoreSdeVePipeline",
    )
    out = sde(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=8)
    assert out.images.shape == (1, 8, 8, 3)
    assert 0.0 <= out.images.min() and out.images.max() <= 1.0


@pytest.mark.slow
def test_full_stride_movie_at_t1000(pipe):
    """capture_every=1 at T=1000 — the reference's every-step trajectory
    (pipeline_ddpm.py:103-113). The frame buffer is carried through the scan,
    so this is the memory-heaviest capture configuration; it must produce
    exactly T frames whose last equals the final image."""
    out = pipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=1000,
               save_every_step=True, capture_every=1)
    assert out.movie is not None
    assert out.movie.shape == (1000, 1, 8, 8, 3)
    np.testing.assert_allclose(out.movie[-1], out.images, atol=1e-6)
    # trajectory actually evolves (not a repeated frame)
    assert np.abs(out.movie[0] - out.movie[-1]).max() > 0.05


def test_karras_ve_movie_capture():
    """KarrasVe's own scan engine supports the same strided trajectory
    capture as the generic sample_loop (a movie request used to silently
    return None — round-2 advisor finding)."""
    from baddiffusion_tpu.schedulers import KarrasVeConfig, KarrasVeScheduler

    model = UNet2DModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    # tame sigma schedule: the default sigma_max=100 blows up through an
    # UNTRAINED model (values explode multiplicatively per step); this test
    # pins the capture plumbing, not sampler numerics (those are covered by
    # the step-level torch parity in test_solver_parity.py)
    cfg = KarrasVeConfig(sigma_max=1.0, sigma_min=0.02, s_churn=0.0)
    kpipe = DiffusionPipeline(model, params, KarrasVeScheduler(cfg))
    out = kpipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=6,
                save_every_step=True, capture_every=2)
    assert out.movie is not None
    assert out.movie.shape == (3, 1, 8, 8, 3)
    assert out.movie.min() >= 0.0 and out.movie.max() <= 1.0
    assert np.isfinite(out.images).all()
    # no-capture path unchanged
    plain = kpipe(batch_size=1, key=jax.random.PRNGKey(0), num_inference_steps=6)
    assert plain.movie is None
    np.testing.assert_allclose(plain.images, out.images, atol=1e-6)


def test_bf16_eval_drift_bounded(pipe):
    """--eval_dtype bf16 (pipeline.compute_dtype) must stay metric-compatible
    with f32 sampling. The backdoor-MSE planted/not decision gap is ~0.2
    (planted ~1e-3 vs unplanted ~0.2, PARITY.md); the asserted drift bounds
    sit two orders of magnitude below it so the bf16 mode can never flip the
    classification. Measured on this tiny model at 50 steps:
    mean|Δpixel| 4.3e-4, ΔMSE 1.5e-7 (hardware numbers for the trained
    113.7M checkpoint are in PARITY.md)."""
    from baddiffusion_tpu.metrics import mse

    init = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3), jnp.float32))
    k = jax.random.PRNGKey(0)
    a = pipe(init=init, key=k, num_inference_steps=50).images
    b16 = DiffusionPipeline(pipe.unet, pipe.params, pipe.scheduler, compute_dtype=jnp.bfloat16)
    b = b16(init=init, key=k, num_inference_steps=50).images
    target = np.zeros_like(a)  # any fixed target: bounds |mse(a,t)-mse(b,t)|
    assert np.abs(a - b).mean() < 0.01
    assert abs(float(mse(a, target)) - float(mse(b, target))) < 2e-3


class TestMeshSampling:
    """Data-parallel sampling over the virtual 8-device mesh: samples are
    independent (no cross-batch collectives), so sharded results must match
    single-device sampling; ragged batches pad to the data-axis multiple and
    trim back."""

    def _mesh_pipe(self, pipe):
        from baddiffusion_tpu.parallel import make_mesh

        mp = DiffusionPipeline(
            pipe.unet, pipe.params, pipe.scheduler,
            default_inference_steps=10, mesh=make_mesh(),
        )
        return mp

    def test_sharded_matches_single_device(self, pipe):
        mp = self._mesh_pipe(pipe)
        k = jax.random.PRNGKey(3)
        a = pipe(batch_size=8, key=k, num_inference_steps=5).images
        b = mp(batch_size=8, key=k, num_inference_steps=5).images
        # partitioning changes XLA fusion order; observed drift ~2e-6 over
        # 5 accumulated steps (not a logic difference)
        np.testing.assert_allclose(a, b, atol=1e-4)
        assert b.shape == (8, 8, 8, 3)

    def test_ragged_batch_pads_and_trims(self, pipe):
        mp = self._mesh_pipe(pipe)
        k = jax.random.PRNGKey(4)
        init = np.asarray(jax.random.normal(k, (5, 8, 8, 3), jnp.float32))
        a = pipe(init=init, key=k, num_inference_steps=5).images
        b = mp(init=init, key=k, num_inference_steps=5).images
        assert b.shape == (5, 8, 8, 3)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_movie_capture_sharded(self, pipe):
        mp = self._mesh_pipe(pipe)
        out = mp(batch_size=3, key=jax.random.PRNGKey(0), num_inference_steps=6,
                 save_every_step=True, capture_every=2)
        assert out.movie is not None
        assert out.movie.shape[1] == 3  # trimmed back from the padded batch

    def test_batch_sampling_through_mesh(self, pipe):
        mp = self._mesh_pipe(pipe)
        imgs = batch_sampling(12, mp, max_batch_n=8, num_inference_steps=4)
        assert imgs.shape == (12, 8, 8, 3)

    def test_ensure_on_device_repins_mixed_sharded_tree(self):
        """A tree whose FIRST leaf is already replicated but whose others are
        mesh-sharded (FSDP keeps small biases replicated; a bias can sort
        first) must still be re-pinned to the replicated layout — otherwise
        the jitted sampler all-gathers the big kernels on EVERY call."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from baddiffusion_tpu.parallel import make_mesh
        from baddiffusion_tpu.pipelines.sampler import ensure_on_device

        mesh = make_mesh()
        rep = NamedSharding(mesh, P())
        tree = {
            "a_bias": jax.device_put(jnp.zeros((4,)), rep),
            "kernel": jax.device_put(jnp.zeros((8, 16)), NamedSharding(mesh, P("data"))),
        }
        assert jax.tree.leaves(tree)[0].sharding == rep  # the trap: leaf 0 passes
        out = ensure_on_device(tree, mesh)
        assert all(l.sharding == rep for l in jax.tree.leaves(out))
        # fully-replicated trees pass through without a copy
        again = ensure_on_device(out, mesh)
        assert all(a is b for a, b in zip(jax.tree.leaves(again), jax.tree.leaves(out)))


class TestSegmentedSampling:
    """pipeline.segment_steps: the chain as repeated bounded-length programs
    must be numerically IDENTICAL to the single-program scan (same per-step
    ops, same PRNG split sequence) — the operational knob for multi-minute
    chains that can outlive a device worker (pipeline._segment_fns)."""

    def _seg_pipe(self, pipe, seg):
        import copy

        p = DiffusionPipeline(
            pipe.unet, pipe.params, pipe.scheduler,
            default_inference_steps=pipe.default_inference_steps,
        )
        p.segment_steps = seg
        return p

    def test_segmented_matches_single_program(self, pipe):
        k = jax.random.PRNGKey(3)
        ref = pipe(batch_size=2, key=k, num_inference_steps=12).images
        for seg in (5, 4, 1):  # remainder segment, exact divisor, per-step
            got = self._seg_pipe(pipe, seg)(batch_size=2, key=k, num_inference_steps=12).images
            np.testing.assert_array_equal(got, ref)

    def test_segmented_movie_matches(self, pipe):
        k = jax.random.PRNGKey(5)
        ref = pipe(batch_size=1, key=k, num_inference_steps=10,
                   save_every_step=True, capture_every=3)
        got = self._seg_pipe(pipe, 4)(batch_size=1, key=k, num_inference_steps=10,
                                      save_every_step=True, capture_every=3)
        np.testing.assert_array_equal(got.images, ref.images)
        np.testing.assert_array_equal(got.movie, ref.movie)
        np.testing.assert_array_equal(got.movie[-1], got.images)

    def test_segmented_multistep_solver_state_carries(self, pipe):
        # UniPC carries ring buffers + last_sample across steps; a segment
        # boundary must not reset them
        from baddiffusion_tpu.schedulers import UniPCConfig, UniPCMultistepScheduler

        sp = DiffusionPipeline(
            pipe.unet, pipe.params, UniPCMultistepScheduler(UniPCConfig()),
            default_inference_steps=10,
        )
        k = jax.random.PRNGKey(0)
        ref = sp(batch_size=2, key=k, num_inference_steps=10).images
        sp.segment_steps = 3
        got = sp(batch_size=2, key=k, num_inference_steps=10).images
        np.testing.assert_array_equal(got, ref)

    def test_segmented_with_start_from(self, pipe):
        k = jax.random.PRNGKey(1)
        ref = pipe(batch_size=1, key=k, num_inference_steps=10, start_from=4).images
        got = self._seg_pipe(pipe, 2)(batch_size=1, key=k, num_inference_steps=10,
                                      start_from=4).images
        np.testing.assert_array_equal(got, ref)

    def test_segmented_on_mesh_matches(self, pipe):
        from baddiffusion_tpu.parallel import make_mesh

        k = jax.random.PRNGKey(9)
        mp = self._seg_pipe(pipe, None)
        mp.mesh = make_mesh()
        mesh_ref = mp(batch_size=8, key=k, num_inference_steps=8).images
        sp = self._seg_pipe(pipe, 4)
        sp.mesh = make_mesh()
        got = sp(batch_size=8, key=k, num_inference_steps=8).images
        # segmenting must be exact against the same-mesh single program;
        # mesh-vs-single-device carries the usual reduction-order noise
        # (bounded like TestMeshSampling)
        np.testing.assert_array_equal(got, mesh_ref)
        single = pipe(batch_size=8, key=k, num_inference_steps=8).images
        np.testing.assert_allclose(got, single, atol=1e-4)

    def test_segmented_sde_ve_matches(self, pipe):
        from baddiffusion_tpu.schedulers import ScoreSdeVeConfig, ScoreSdeVeScheduler

        sp = DiffusionPipeline(
            pipe.unet, pipe.params,
            ScoreSdeVeScheduler(ScoreSdeVeConfig(num_train_timesteps=100)),
            default_inference_steps=12, hf_class_name="ScoreSdeVePipeline",
        )
        k = jax.random.PRNGKey(2)
        ref = sp(batch_size=2, key=k, num_inference_steps=12,
                 save_every_step=True, capture_every=5)
        sp2 = DiffusionPipeline(
            pipe.unet, pipe.params,
            ScoreSdeVeScheduler(ScoreSdeVeConfig(num_train_timesteps=100)),
            default_inference_steps=12, hf_class_name="ScoreSdeVePipeline",
        )
        sp2.segment_steps = 5
        got = sp2(batch_size=2, key=k, num_inference_steps=12,
                  save_every_step=True, capture_every=5)
        np.testing.assert_array_equal(got.images, ref.images)
        np.testing.assert_array_equal(got.movie, ref.movie)
