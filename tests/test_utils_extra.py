"""Samples visualization + EMA + misc utils."""

import numpy as np
import pytest

from baddiffusion_tpu.utils import Samples, normalize, path_gen
from baddiffusion_tpu.utils.image import batchify, make_grid


def test_samples_series(tmp_path):
    frames = np.random.RandomState(0).rand(5, 4, 8, 8, 3).astype(np.float32)
    s = Samples(frames, save_dir=str(tmp_path))
    s.plot_series(prefix_img_name="t", animate_name="mov", save_mode=Samples.SAVE_FIRST_LAST)
    import os

    files = set(os.listdir(tmp_path))
    assert {"t0.png", "t4.png", "mov.gif"} <= files
    s.save("series.pkl")
    loaded = Samples.load(str(tmp_path / "series.pkl"), save_dir=str(tmp_path))
    np.testing.assert_array_equal(loaded.samples, frames)


def test_ema_warmup_and_convergence():
    import jax.numpy as jnp

    from baddiffusion_tpu.training import ema_decay, ema_init, ema_update

    # warm-up: early decay is small, approaches max
    assert float(ema_decay(jnp.asarray(1))) < 0.5
    assert float(ema_decay(jnp.asarray(10_000_000))) == pytest.approx(0.9999, abs=1e-6)

    state = ema_init({"w": jnp.zeros(3)})
    target = {"w": jnp.ones(3)}
    for _ in range(200):
        state = ema_update(state, target)
    assert float(state.params["w"][0]) > 0.9  # converges toward target


def test_normalize_and_grid():
    x = np.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(normalize(x, 0, 1, -1, 1), [-1, 0, 1])
    grid = make_grid(np.zeros((4, 8, 8, 3), np.float32), rows=2, cols=2)
    assert grid.shape[0] == grid.shape[1]
    assert path_gen(["a", "b"], ["1"]) == ["a_1", "b_1"]
    assert batchify(10, 4) == [4, 4, 2]


def test_lr_schedule_variants_vs_reference_formulas():
    import jax.numpy as jnp

    from baddiffusion_tpu.training.optim import (
        constant_schedule_with_warmup,
        cosine_with_restarts_schedule_with_warmup,
        linear_schedule_with_warmup,
        polynomial_schedule_with_warmup,
    )

    lin = linear_schedule_with_warmup(1.0, 10, 110)
    assert float(lin(5)) == pytest.approx(0.5)
    assert float(lin(10)) == pytest.approx(1.0)
    assert float(lin(60)) == pytest.approx(0.5)
    assert float(lin(110)) == pytest.approx(0.0)

    const = constant_schedule_with_warmup(2.0, 10)
    assert float(const(5)) == pytest.approx(1.0)
    assert float(const(100)) == pytest.approx(2.0)

    poly = polynomial_schedule_with_warmup(1.0, 0, 100, lr_end=0.0, power=2.0)
    assert float(poly(50)) == pytest.approx(0.25, abs=1e-6)
    assert float(poly(200)) == pytest.approx(0.0, abs=1e-9)

    res = cosine_with_restarts_schedule_with_warmup(1.0, 0, 100, num_cycles=2)
    assert float(res(0)) == pytest.approx(1.0)  # cycle start
    assert float(res(25)) == pytest.approx(0.5, abs=1e-5)  # mid-cycle
    assert float(res(49)) == pytest.approx(0.0, abs=1e-2)  # cycle end
    assert float(res(50)) == pytest.approx(1.0, abs=1e-5)  # hard restart


def test_numpy_to_pil_and_match_count(tmp_path):
    from baddiffusion_tpu.utils.image import match_count, numpy_to_pil, save_images

    imgs = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
    pils = numpy_to_pil(imgs)
    assert len(pils) == 3 and pils[0].size == (8, 8)
    save_images(imgs, str(tmp_path))
    assert match_count(str(tmp_path)) == 3


@pytest.mark.reference
class TestEMAParityVsReference:
    """Step-for-step parity with the vendored torch EMAModel
    (training_utils.py:46-230): shadow params AND decay values, across both
    warm-up modes, update_after_step delays, and min_decay floors."""

    def _run_pair(self, n_steps, **kw):
        import jax.numpy as jnp
        import numpy as np
        import torch

        from baddiffusion_tpu.training import ema_decay, ema_init, ema_update
        from tests.reference_utils import import_reference_diffusers

        diffusers = import_reference_diffusers()
        from diffusers.training_utils import EMAModel

        torch.manual_seed(0)
        tparams = [torch.nn.Parameter(torch.randn(4, 3)), torch.nn.Parameter(torch.randn(7))]
        ref = EMAModel(
            tparams,
            decay=kw.get("max_decay", 0.9999),
            min_decay=kw.get("min_decay", 0.0),
            update_after_step=kw.get("update_after_step", 0),
            use_ema_warmup=kw.get("use_warmup", False),
            inv_gamma=kw.get("inv_gamma", 1.0),
            power=kw.get("power", 2.0 / 3.0),
        )
        state = ema_init({"a": jnp.asarray(tparams[0].detach().numpy()),
                          "b": jnp.asarray(tparams[1].detach().numpy())})
        rng = np.random.RandomState(1)
        for i in range(n_steps):
            with torch.no_grad():
                for p in tparams:
                    p.add_(torch.from_numpy(rng.normal(0, 0.1, p.shape).astype(np.float32)))
            ref.step(tparams)
            state = ema_update(
                state, {"a": jnp.asarray(tparams[0].detach().numpy()),
                        "b": jnp.asarray(tparams[1].detach().numpy())}, **kw
            )
            got_decay = float(ema_decay(state.step, **kw))
            assert got_decay == pytest.approx(ref.cur_decay_value, abs=1e-6), (i, got_decay)
        np.testing.assert_allclose(np.asarray(state.params["a"]), ref.shadow_params[0].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.params["b"]), ref.shadow_params[1].numpy(), atol=1e-5)

    def test_default_mode(self):
        self._run_pair(12)

    def test_warmup_mode(self):
        self._run_pair(12, use_warmup=True, inv_gamma=1.0, power=0.75)

    def test_update_after_step_and_min_decay(self):
        self._run_pair(15, update_after_step=5, min_decay=0.2)

    def test_low_max_decay(self):
        self._run_pair(8, max_decay=0.5)


def test_measure_hbm_traffic_cpu_contract():
    """measure_hbm_traffic returns honest zeros when the platform produces no
    TPU device plane (tests run on CPU) — the bench/roofline consumers key on
    hbm_gib_per_step being truthy, so a CPU run must not fabricate traffic."""
    import jax
    import jax.numpy as jnp

    from baddiffusion_tpu.utils.profiling import measure_hbm_traffic

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 64))
    f(x).block_until_ready()
    stats = measure_hbm_traffic(lambda: f(x).block_until_ready(), steps=2)
    assert set(stats) >= {
        "hbm_gib_per_step", "hbm_bytes_per_step", "device_time_ms_per_step",
        "hbm_gbps_busy", "measured_flops_per_step",
    }
    assert stats["hbm_gib_per_step"] == 0.0
    assert stats["hbm_gbps_busy"] == 0.0
