"""Metrics: MSE/SSIM properties + FID machinery (Fréchet distance closed-form
oracles, directory pipeline, proxy-extractor determinism, InceptionV3 shapes)."""

import numpy as np
import pytest

from baddiffusion_tpu.metrics import compute_statistics, fid, frechet_distance, get_activations, mse, ssim


class TestImageMetrics:
    def test_mse(self):
        a = np.zeros((2, 8, 8, 3), np.float32)
        b = np.full((2, 8, 8, 3), 0.5, np.float32)
        assert float(mse(a, b)) == pytest.approx(0.25)

    def test_ssim_identity(self):
        rng = np.random.RandomState(0)
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.RandomState(0)
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        y1 = np.clip(x + 0.05 * rng.randn(*x.shape), 0, 1).astype(np.float32)
        y2 = np.clip(x + 0.3 * rng.randn(*x.shape), 0, 1).astype(np.float32)
        s1, s2 = float(ssim(x, y1)), float(ssim(x, y2))
        assert 1.0 > s1 > s2 > 0.0

    def test_ssim_matches_closed_form_on_constant_shift(self):
        # for constant images, ssim = (2*mu_a*mu_b + c1)/(mu_a^2 + mu_b^2 + c1)
        a = np.full((1, 16, 16, 1), 0.4, np.float32)
        b = np.full((1, 16, 16, 1), 0.6, np.float32)
        c1 = 0.01**2
        expected = (2 * 0.4 * 0.6 + c1) / (0.4**2 + 0.6**2 + c1)
        assert float(ssim(a, b)) == pytest.approx(expected, rel=1e-4)


class TestFID:
    def test_frechet_identical(self):
        rng = np.random.RandomState(0)
        act = rng.randn(500, 16).astype(np.float64)
        mu, sig = compute_statistics(act)
        assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-4)

    def test_frechet_mean_shift_closed_form(self):
        # identical covariances, shifted means: d^2 = |mu1-mu2|^2
        rng = np.random.RandomState(0)
        act = rng.randn(2000, 8)
        mu, sig = compute_statistics(act)
        shift = np.full(8, 0.5)
        d = frechet_distance(mu, sig, mu + shift, sig)
        assert d == pytest.approx(float(shift @ shift), rel=1e-3)

    def test_frechet_diagonal_gaussians(self):
        # d^2 = sum((s1-s2)^2) for zero-mean diagonal gaussians
        s1, s2 = np.array([1.0, 2.0]), np.array([1.5, 1.0])
        d = frechet_distance(np.zeros(2), np.diag(s1**2), np.zeros(2), np.diag(s2**2))
        assert d == pytest.approx(float(((s1 - s2) ** 2).sum()), rel=1e-6)

    @pytest.mark.slow  # full InceptionV3 over two dirs: heaviest FID path
    def test_fid_pipeline_dirs(self, tmp_path):
        from baddiffusion_tpu.utils.image import save_images

        rng = np.random.RandomState(0)
        a = rng.rand(32, 16, 16, 3).astype(np.float32)
        b = np.clip(a + 0.3 * rng.randn(*a.shape), 0, 1).astype(np.float32)
        save_images(a, str(tmp_path / "a"))
        save_images(a, str(tmp_path / "a2"))
        save_images(b, str(tmp_path / "b"))
        d_same = fid([str(tmp_path / "a"), str(tmp_path / "a2")], batch_size=16)
        d_diff = fid([str(tmp_path / "a"), str(tmp_path / "b")], batch_size=16)
        assert d_diff > d_same

    def test_dir_activations_stream_batches_and_match_array(self, tmp_path):
        """Directory inputs must decode per batch (bounded RAM — the
        reference streams via a DataLoader, fid_score.py:91-147) and yield
        the SAME activations as the fully-materialized array path."""
        from baddiffusion_tpu.utils import image as img_mod
        from baddiffusion_tpu.utils.image import save_images

        rng = np.random.RandomState(2)
        imgs = rng.rand(10, 16, 16, 3).astype(np.float32)
        save_images(imgs, str(tmp_path / "d"))

        calls = []
        orig = img_mod.load_image_files

        def spy(files, size=None):
            calls.append(len(files))
            return orig(files, size=size)

        import unittest.mock as mock

        with mock.patch.object(img_mod, "load_image_files", spy):
            from_dir = get_activations(str(tmp_path / "d"), batch_size=4)
        # streamed in ≤batch_size chunks, never the whole dir at once
        assert calls == [4, 4, 2]
        # PNG round-trip quantizes to uint8 — compare against the same bytes
        from baddiffusion_tpu.utils.image import load_image_dir

        from_array = get_activations(load_image_dir(str(tmp_path / "d")), batch_size=10)
        np.testing.assert_allclose(from_dir, from_array, atol=1e-5)

    def test_ssim_custom_sigma(self):
        """sigma is host-side kernel construction → must be a static jit arg
        (a traced sigma crashes with TracerArrayConversionError)."""
        from baddiffusion_tpu.metrics import ssim

        rng = np.random.RandomState(3)
        a = rng.rand(2, 16, 16, 3).astype(np.float32)
        s = float(ssim(a, np.clip(a + 0.1, 0, 1), sigma=2.0))
        assert 0.0 < s < 1.0

    def test_proxy_extractor_deterministic(self):
        rng = np.random.RandomState(1)
        imgs = rng.rand(4, 16, 16, 3).astype(np.float32)
        a1 = get_activations(imgs, batch_size=4)
        a2 = get_activations(imgs, batch_size=2)  # padding path
        np.testing.assert_allclose(a1, a2, atol=1e-5)
        assert a1.shape == (4, 2048)

    def test_fid_cli(self, tmp_path, capsys):
        from baddiffusion_tpu.metrics.fid import main
        from baddiffusion_tpu.utils.image import save_images

        rng = np.random.RandomState(0)
        save_images(rng.rand(8, 16, 16, 3).astype(np.float32), str(tmp_path / "x"))
        save_images(rng.rand(8, 16, 16, 3).astype(np.float32), str(tmp_path / "y"))
        log = tmp_path / "fid.log"
        val = main([str(tmp_path / "x"), str(tmp_path / "y"), "--batch-size", "8", "--log", str(log)])
        assert np.isfinite(val)
        assert log.exists() and "FID" in log.read_text()


class TestInceptionArch:
    @pytest.mark.slow  # full 299px InceptionV3 jit: ~1 min on 1 CPU core
    def test_shapes_and_determinism(self):
        import jax
        import jax.numpy as jnp

        from baddiffusion_tpu.models.inception import FIDInceptionV3

        model = FIDInceptionV3()
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        # stem + 11 mixed blocks present
        names = set(params.keys())
        assert {"Conv2d_1a_3x3", "Mixed_5b", "Mixed_6e", "Mixed_7c"} <= names
        y = model.apply({"params": params}, jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)))
        assert y.shape == (2, 2048)
        assert np.isfinite(np.asarray(y)).all()

    def test_grayscale_input(self):
        import jax
        import jax.numpy as jnp

        from baddiffusion_tpu.models.inception import FIDInceptionV3

        model = FIDInceptionV3()
        x = jnp.zeros((1, 28, 28, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        y = model.apply({"params": params}, x)
        assert y.shape == (1, 2048)


@pytest.mark.slow
class TestFIDInceptionConversionParity:
    """Validate the flax FID-InceptionV3 port + torch→flax weight conversion
    against a torch implementation of the same architecture (pytorch_fid's
    pool3 network, written from spec in tests/fid_inception_torch.py) with
    fully randomized weights and BN statistics.

    This is the maximal offline proof of absolute-FID comparability: the
    architecture, key mapping, pooling semantics, resize and normalization all
    match; only the real `pt_inception-2015-12-05` weight FILE (network
    egress) remains unverified — when staged, `load_fid_inception` consumes it
    through exactly this code path.
    """

    def _save_randomized(self, tmp_path, seed=0):
        import torch

        from tests.fid_inception_torch import randomized

        model = randomized(seed)
        sd = model.state_dict()
        # the real file also carries the fc / AuxLogits tensors that the
        # loader must strip
        sd["fc.weight"] = torch.zeros(1008, 2048)
        sd["fc.bias"] = torch.zeros(1008)
        sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
        path = tmp_path / "pt_inception_random.pth"
        torch.save(sd, str(path))
        return model, str(path)

    def test_pool3_activation_parity(self, tmp_path):
        import jax.numpy as jnp
        import torch

        from baddiffusion_tpu.models.inception import load_fid_inception

        tm, path = self._save_randomized(tmp_path)
        model, params = load_fid_inception(path)

        rng = np.random.RandomState(42)
        # 32x32 exercises the bilinear 299 upsample exactly like CIFAR eval
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        assert ours.shape == theirs.shape == (2, 2048)
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours, theirs, atol=max(1e-4, 2e-4 * scale), rtol=2e-3)

    def test_grayscale_and_native_299(self, tmp_path):
        import jax.numpy as jnp
        import torch

        from baddiffusion_tpu.models.inception import load_fid_inception

        tm, path = self._save_randomized(tmp_path, seed=3)
        model, params = load_fid_inception(path)
        rng = np.random.RandomState(7)
        for shape in [(1, 28, 28, 1), (1, 299, 299, 3)]:
            x = rng.rand(*shape).astype(np.float32)
            ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
            xt = torch.from_numpy(np.repeat(x, 3, -1).transpose(0, 3, 1, 2) if shape[-1] == 1
                                  else x.transpose(0, 3, 1, 2))
            with torch.no_grad():
                theirs = tm(xt).numpy()
            scale = np.abs(theirs).max()
            np.testing.assert_allclose(ours, theirs, atol=max(1e-4, 2e-4 * scale), rtol=2e-3)

    def test_end_to_end_fid_value_parity(self, tmp_path):
        """Full fid() through the converted extractor vs a torch-side FID
        (same Fréchet code both sides — isolates the extractor)."""
        import jax
        import jax.numpy as jnp
        import torch

        from baddiffusion_tpu.metrics.fid import compute_statistics, fid, frechet_distance

        tm, path = self._save_randomized(tmp_path, seed=1)
        import baddiffusion_tpu.models.inception as inception

        model, params = inception.load_fid_inception(path)

        @jax.jit
        def extract(images):
            return model.apply({"params": params}, images)

        rng = np.random.RandomState(0)
        a = rng.rand(8, 32, 32, 3).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = fid([a, b], extractor=extract, batch_size=8)

        with torch.no_grad():
            fa = tm(torch.from_numpy(a.transpose(0, 3, 1, 2))).numpy()
            fb = tm(torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
        theirs = frechet_distance(*compute_statistics(fa), *compute_statistics(fb))
        assert abs(ours - theirs) / max(abs(theirs), 1e-9) < 0.05, (ours, theirs)
