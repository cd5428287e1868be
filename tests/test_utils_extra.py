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
