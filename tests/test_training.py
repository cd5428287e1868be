"""Training layer: LR schedule oracle, train-step loss descent, grad accum
equivalence, sharded multi-device step on the virtual CPU mesh, checkpoint
resume."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baddiffusion_tpu.data import DatasetLoader
from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
from baddiffusion_tpu.parallel import make_mesh
from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
from baddiffusion_tpu.training import (
    cosine_schedule_with_warmup,
    create_train_state,
    load_trainer_state,
    make_optimizer,
    make_train_step,
    save_trainer_state,
)

TINY = UNet2DConfig(
    sample_size=16,
    layers_per_block=1,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    norm_num_groups=4,
    attention_head_dim=4,
)


def make_bits(batch_size=8, grad_accum=1, mesh=None, lr=1e-3):
    model = UNet2DModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, lr_sched = make_optimizer(lr, num_warmup_steps=10, num_training_steps=100)
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=batch_size, fake_size=32)
    dsl.set_poison("BOX_8", "CORNER", poison_rate=0.5).prepare_dataset()
    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(
        model,
        optimizer,
        sched.config.num_train_timesteps,
        sstate.schedule.alphas,
        sstate.schedule.alphas_cumprod,
        grad_accum=grad_accum,
        mesh=mesh,
    )
    return model, state, step, dsl, lr_sched


def test_cosine_schedule_matches_reference_formula():
    sched = cosine_schedule_with_warmup(2e-4, num_warmup_steps=500, num_training_steps=10_000)
    assert float(sched(0)) == 0.0
    assert float(sched(250)) == pytest.approx(1e-4)
    assert float(sched(500)) == pytest.approx(2e-4)
    # cosine at mid progress
    prog = (5250 - 500) / (10_000 - 500)
    expected = 2e-4 * 0.5 * (1 + math.cos(math.pi * prog))
    assert float(sched(5250)) == pytest.approx(expected, rel=1e-5)
    assert float(sched(10_000)) == pytest.approx(0.0, abs=1e-9)


def test_loss_decreases():
    model, state, step, dsl, _ = make_bits(batch_size=8, lr=5e-3)
    batch = next(dsl.epoch_batches(0))
    losses = []
    for i in range(12):
        state, metrics = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_grad_accum_matches_full_batch():
    # same RNG split per micro-batch != full batch exactly, but with zero
    # noise difference eliminated: compare accum grads vs manual mean of micro grads
    model, state, step1, dsl, _ = make_bits(batch_size=8, grad_accum=1)
    _, state2, step2, _, _ = make_bits(batch_size=8, grad_accum=2)
    batch = next(dsl.epoch_batches(0))
    s1, m1 = step1(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    s2, m2 = step2(state2, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    # both descend and produce finite loss; exact equality isn't expected
    # (different per-micro RNG), but magnitudes must agree
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1.0


def test_sharded_step_on_mesh():
    assert len(jax.devices()) == 8, "conftest must expose 8 virtual devices"
    mesh = make_mesh()
    model, state, step, dsl, _ = make_bits(batch_size=16, mesh=mesh)
    batch = next(dsl.epoch_batches(0))
    state, metrics = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated; second step consumes donated state fine
    state, metrics = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    model, state, step, dsl, _ = make_bits()
    batch = next(dsl.epoch_batches(0))
    state, _ = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))
    save_trainer_state(str(tmp_path), jax.device_get(state), epoch=3)

    _, template, _, _, _ = make_bits()
    restored, epoch, gstep = load_trainer_state(str(tmp_path), jax.device_get(template))
    assert epoch == 3 and gstep == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # training continues from the restored state
    restored2, metrics = step(restored, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    assert int(restored2.step) == 2


def test_async_checkpoint_roundtrip(tmp_path):
    """--async_ckpt semantics: the orbax write overlaps the caller; data.json
    is DEFERRED until the commit is known complete (finish_async_saves or the
    next save), so resume can never see metadata ahead of committed arrays."""
    import os

    from baddiffusion_tpu.training.checkpoint import finish_async_saves, has_trainer_state

    model, state, step, dsl, _ = make_bits()
    batch = next(dsl.epoch_batches(0))
    state, _ = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))

    out = str(tmp_path / "run")
    save_trainer_state(out, jax.device_get(state), epoch=1, async_save=True)
    # metadata publication is deferred: until the commit is finalized, resume
    # must not consider this checkpoint complete
    assert not os.path.exists(os.path.join(out, "data.json"))
    finish_async_saves()
    assert has_trainer_state(out)

    _, template, _, _, _ = make_bits()
    restored, epoch, gstep = load_trainer_state(out, jax.device_get(template))
    assert epoch == 1 and gstep == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )

    # CRASH-WINDOW DURABILITY: while the second async save is in flight, the
    # previously committed checkpoint must remain fully restorable — each
    # async save goes to a fresh versioned dir, never force-overwriting the
    # one data.json references (orbax force=True deletes the destination for
    # the whole write window)
    restored, _ = step(restored, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    save_trainer_state(out, jax.device_get(restored), epoch=2, async_save=True)
    crash_view, epoch_c, gstep_c = load_trainer_state(out, jax.device_get(template))
    assert (epoch_c, gstep_c) == (1, 1)  # a crash here resumes from epoch 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(crash_view.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )

    # a trailing SYNC save finalizes the in-flight commit first, then its own
    # publish supersedes everything; stale versioned dirs are GC'd only after
    # the new metadata is out
    save_trainer_state(out, jax.device_get(restored), epoch=3)
    restored2, epoch2, gstep2 = load_trainer_state(out, jax.device_get(template))
    assert epoch2 == 3 and gstep2 == 2
    leftovers = [n for n in os.listdir(out) if n.startswith("ckpt")]
    assert leftovers == ["ckpt"], leftovers


def test_async_ckpt_multiprocess_falls_back(monkeypatch, tmp_path):
    """On a multi-process launch async_save must degrade to the proven
    barrier-coupled SYNC path (orbax commit + immediate data.json) — the
    async deferral is single-process-only by design. Only the ROUTING is
    under test (via recording stubs): real 2-process saves are covered by
    tests/test_multihost.py."""
    import json
    import os

    from baddiffusion_tpu.training import checkpoint as ckpt_mod

    model, state, step, dsl, _ = make_bits()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(ckpt_mod, "_barrier", lambda tag: None)

    routes = []

    class FakeSyncCkptr:
        def save(self, path, state=None, force=False, args=None):
            routes.append("sync")

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(ckpt_mod, "_checkpointer", FakeSyncCkptr)
    monkeypatch.setattr(
        ckpt_mod, "_async_checkpointer",
        lambda: pytest.fail("async path must not be taken with process_count > 1"),
    )
    out = str(tmp_path / "run")
    save_trainer_state(out, jax.device_get(state), epoch=5, async_save=True)
    assert routes == ["sync"]
    with open(os.path.join(out, "data.json")) as f:  # written synchronously
        assert json.load(f) == {"epoch": 5, "step": 0, "ckpt": "ckpt"}


def test_global_batch_from_host_shards():
    from baddiffusion_tpu.parallel import global_batch_from_host_shards, host_shard_slice, make_mesh

    mesh = make_mesh()
    batch = {
        "image_u8": np.zeros((16, 8, 8, 3), np.uint8),
        "is_clean": np.ones(16, bool),
    }
    sl = host_shard_slice(16)
    assert sl == slice(0, 16)  # single-process
    out = global_batch_from_host_shards(batch, mesh)
    assert out["image_u8"].shape == (16, 8, 8, 3)
    assert len(out["image_u8"].sharding.device_set) == 8


def test_put_global_matches_device_put():
    """put_global must produce the identical global array (shape, sharding,
    values) as a plain device_put for host values and 0-d leaves — it exists
    to skip only the multi-process Gloo rendezvous, not to change layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.parallel.mesh import put_global

    mesh = make_mesh()
    cases = [
        (np.arange(16 * 4, dtype=np.float32).reshape(16, 4), P("data", None)),
        (np.arange(16 * 4, dtype=np.float32).reshape(16, 4), P()),
        (np.float32(3.5), P()),  # 0-d leaf (TrainState.step)
        (jnp.arange(8, dtype=jnp.int32), P("data")),  # uncommitted jax.Array
    ]
    for x, spec in cases:
        sharding = NamedSharding(mesh, spec)
        a = put_global(x, sharding)
        b = jax.device_put(x, sharding)
        assert a.shape == b.shape and a.dtype == b.dtype
        assert a.sharding == b.sharding, (spec, a.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # an already-global (resharding) input passes through device_put
    g = jax.device_put(np.ones((16, 4), np.float32), NamedSharding(mesh, P("data", None)))
    r = put_global(g, NamedSharding(mesh, P()))
    assert r.sharding == NamedSharding(mesh, P())
    np.testing.assert_array_equal(np.asarray(r), np.ones((16, 4)))


def test_warmup_mesh_collectives_runs_on_both_mesh_shapes():
    """Per-axis clique warmup must execute cleanly on 1-D and 2-D meshes
    (it runs unconditionally at CLI mesh build; single-process it is just a
    tiny psum per axis)."""
    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.parallel.distributed import warmup_mesh_collectives

    warmup_mesh_collectives(make_mesh())
    warmup_mesh_collectives(make_mesh(shape=(4, 2), axis_names=("data", "model")))


def test_tensor_parallel_2d_mesh():
    # dp×tp mesh: wide kernels sharded on 'model', batch on 'data'
    from baddiffusion_tpu.parallel.sharding_rules import shard_params, unet_param_specs

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    model, state, _, dsl, _ = make_bits(batch_size=16)
    params = shard_params(jax.device_get(state.params), mesh, threshold=16)
    specs = unet_param_specs(jax.device_get(state.params), threshold=16)
    # at least one kernel is TP-sharded
    assert any(
        getattr(s, "_partitions", None) and "model" in str(s) for s in jax.tree.leaves(specs)
    ) or any("model" in str(s) for s in map(str, jax.tree.leaves(specs)))

    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(1e-3)
    tp_state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    step = make_train_step(
        model, optimizer, 1000, sstate.schedule.alphas, sstate.schedule.alphas_cumprod, mesh=mesh
    )
    batch = next(dsl.epoch_batches(0))
    tp_state, metrics = step(tp_state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_bitwise_deterministic_training():
    # same seed, same data => bitwise-identical params after k steps
    def run():
        model, state, step, dsl, _ = make_bits(batch_size=8)
        for i, batch in enumerate(dsl.epoch_batches(0)):
            state, _ = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(i))
            if i == 2:
                break
        return jax.device_get(state.params)

    a, b = run(), run()
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fsdp_state_sharding_and_step():
    """ZeRO-3-style layout (parallel/sharding_rules.py): params + Adam
    moments shard over the data axis; the SAME jitted step consumes either
    layout through sharding propagation and produces the same numbers."""
    from baddiffusion_tpu.parallel import fsdp_param_specs, shard_state_fsdp

    mesh = make_mesh()
    model, state, step, dsl, _ = make_bits(batch_size=16, mesh=mesh)
    batch = next(dsl.epoch_batches(0))

    # replicated reference trajectory
    s_rep, m_rep = step(state, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))

    # fresh state in FSDP layout (min_size=1: tiny model, shard everything
    # divisible so the layout is actually exercised)
    _, state2, _, _, _ = make_bits(batch_size=16, mesh=mesh)
    optimizer, _ = make_optimizer(1e-3, num_warmup_steps=10, num_training_steps=100)
    fs = shard_state_fsdp(state2, mesh, optimizer, min_size=1)
    specs = fsdp_param_specs(state2.params, 8, min_size=1)
    sharded_leaves = [
        (p, s) for p, s in zip(jax.tree.leaves(fs.params), jax.tree.leaves(specs))
        if any(ax is not None for ax in s)
    ]
    assert sharded_leaves, "no parameter was actually sharded"
    for p, _ in sharded_leaves:
        shard = p.addressable_shards[0].data
        assert shard.size == p.size // 8  # genuinely split, not replicated

    s_fs, m_fs = step(fs, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_fs["loss"]), float(m_rep["loss"]), rtol=1e-5)
    # parameters after the update agree across layouts
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_fs.params)[0]),
        np.asarray(jax.tree.leaves(s_rep.params)[0]),
        atol=1e-6,
    )
    # second step consumes the (donated) FSDP state fine
    s_fs, m_fs = step(s_fs, batch["image_u8"], batch["is_clean"], jax.random.PRNGKey(1))
    assert np.isfinite(float(m_fs["loss"]))


def test_fsdp_param_specs_honors_axis_argument():
    """fsdp_param_specs(axis=...) must shard over the REQUESTED mesh axis,
    not silently fall back to the data axis."""
    from baddiffusion_tpu.parallel import fsdp_param_specs

    params = {"w": np.zeros((16, 8), np.float32), "b": np.zeros((4,), np.float32)}
    specs = fsdp_param_specs(params, 4, min_size=1, axis="model")
    flat = jax.tree.leaves(specs)  # PartitionSpec is itself a pytree leaf
    assert any("model" in tuple(s) for s in flat)
    assert not any("data" in tuple(s) for s in flat)


def test_final_checkpoint_skipped_when_already_saved(monkeypatch, tmp_path):
    """Normal completion: the last epoch's periodic checkpoint already
    captured the final step — the finally-block must NOT run a second
    (orbax save + param gather) for the identical state; it must still
    save when a crash leaves unsaved progress."""
    from baddiffusion_tpu.training import checkpoint as ckpt_mod
    from baddiffusion_tpu.training.trainer import train_loop

    calls = []
    monkeypatch.setattr(
        ckpt_mod, "save_checkpoint",
        lambda out, state, epoch, mk, all_eps, async_save=False: calls.append(epoch),
    )

    batch = {"image_u8": np.zeros((2, 8, 8, 3), np.uint8), "is_clean": np.ones((2,), bool)}

    class DSL:
        trigger = None

        def epoch_batches(self, epoch):
            yield dict(batch)

    class Tracker:
        def log(self, *a, **k):
            pass

    ok_step = lambda s, img, ic, k: (s, {"loss": jnp.zeros(())})
    common = dict(
        dsl=DSL(), lr_schedule=lambda s: 1e-4, epochs=1, tracker=Tracker(),
        out_dir=str(tmp_path), make_pipeline=lambda st: None,
        save_image_epochs=100, save_model_epochs=1,
    )

    train_loop(train_step=ok_step, state={"params": np.zeros(3)}, **common)
    assert calls == [0]  # periodic save only; finally-block skipped

    def boom(s, img, ic, k):
        raise RuntimeError("step failed")

    calls.clear()
    with pytest.raises(RuntimeError, match="step failed"):
        train_loop(train_step=boom, state={"params": np.zeros(3)}, **common)
    assert calls == [0]  # crash path: the finally-block save DID run


def test_ve_score_matching_step():
    """VE DSM step (training/score_matching.py): loss = E||sigma*s+z||^2 on a
    tiny sigma-conditioned model descends and stays finite; the model is
    called with the CONTINUOUS sigma (the sde_ve_segment sampling contract)."""
    from baddiffusion_tpu.schedulers import ScoreSdeVeConfig, ScoreSdeVeScheduler
    from baddiffusion_tpu.training import create_score_train_state, make_ve_train_step

    model = UNet2DModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    sched = ScoreSdeVeScheduler(ScoreSdeVeConfig(sigma_max=10.0, num_train_timesteps=50))
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(5e-3, num_warmup_steps=2, num_training_steps=100)
    state = create_score_train_state(params, optimizer)
    step = make_ve_train_step(model, optimizer, sstate.discrete_sigmas)
    img = (np.random.RandomState(0).rand(8, 16, 16, 3) * 255).astype(np.uint8)
    losses = []
    for i in range(10):
        state, m = step(state, jnp.asarray(img), jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10


def test_flat_adam_lever_matches_default(monkeypatch):
    """BADDIFFUSION_FLAT_ADAM=1 (training/optim.py) flattens the update into
    one vector op — mathematically identical Adam, different state layout."""
    import optax

    params = {
        "a": {"w": jnp.arange(6.0).reshape(2, 3) / 7.0, "b": jnp.ones((3,))},
        "c": jnp.linspace(-1.0, 1.0, 5),
    }
    grads = jax.tree.map(lambda p: jnp.cos(p) * 0.3, params)

    def one_step():
        tx, _ = make_optimizer(1e-3, num_warmup_steps=0, num_training_steps=10)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        return optax.apply_updates(params, upd)

    baseline = one_step()
    monkeypatch.setenv("BADDIFFUSION_FLAT_ADAM", "1")
    flat = one_step()
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7),
        baseline,
        flat,
    )
