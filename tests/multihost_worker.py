"""Worker process for the multi-host (multi-process) integration test.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; together they form one global
data-parallel mesh. The worker exercises the full multi-host recipe from
`parallel/distributed.py` (SURVEY §2.4/§5.8):

  1. `initialize()` — jax.distributed over a local TCP coordinator;
  2. global mesh over ALL processes' devices;
  3. per-host batch rows via `host_shard_slice`, assembled into global
     data-sharded arrays with `global_batch_from_host_shards`;
  4. ONE full sharded backdoor train step (poison → q-sample → UNet fwd/bwd →
     Adam) — XLA inserts the cross-process gradient all-reduce.

Prints "MULTIHOST_OK <loss>" on success; the losses must agree across
processes (same SPMD program, same data).
"""

import os
import sys


def main() -> None:
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    from baddiffusion_tpu.parallel.distributed import (
        global_batch_from_host_shards,
        host_shard_slice,
        initialize,
    )

    initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from baddiffusion_tpu.data import DatasetLoader
    from baddiffusion_tpu.parallel import make_mesh
    from baddiffusion_tpu.schedulers import DDPMConfig, DDPMScheduler
    from baddiffusion_tpu.training import create_train_state, make_optimizer, make_train_step

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, jax.devices()
    mesh = make_mesh()

    # shard-assembly check: addressable shards hold exactly this host's rows
    total = 4 * nproc
    data = np.arange(total * 3, dtype=np.float32).reshape(total, 3)
    gb = global_batch_from_host_shards({"x": data[host_shard_slice(total)]}, mesh)
    assert gb["x"].shape == (total, 3)
    for shard in gb["x"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), data[shard.index[0]])
    assert abs(float(jax.jit(jnp.sum)(gb["x"])) - float(data.sum())) < 1e-4

    # one full sharded train step with per-host data feeding
    from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel

    cfg = UNet2DConfig(
        sample_size=16,
        layers_per_block=1,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        norm_num_groups=4,
    )
    model = UNet2DModel(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), sample_size=16)  # identical on every host
    sched = DDPMScheduler(DDPMConfig())
    sstate = sched.create_state()
    optimizer, _ = make_optimizer(1e-3, num_warmup_steps=2, num_training_steps=10)

    batch_global = 2 * n_global
    dsl = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=batch_global, fake_size=2 * batch_global)
    dsl.set_poison("BOX_8", "CORNER", poison_rate=0.5).prepare_dataset()

    state = create_train_state(params, optimizer, dsl.trigger, dsl.target, dsl.mask)
    from jax.sharding import NamedSharding, PartitionSpec as P

    # replicate the train state across the global mesh (every host provides
    # the same value — SPMD discipline)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    step = make_train_step(
        model,
        optimizer,
        sched.config.num_train_timesteps,
        sstate.schedule.alphas,
        sstate.schedule.alphas_cumprod,
        mesh=mesh,
    )
    batch = next(dsl.epoch_batches(0))  # same seed → same global batch on every host
    sl = host_shard_slice(batch_global)
    local = {k: v[sl] for k, v in batch.items() if k != "label"}
    gbatch = global_batch_from_host_shards(local, mesh)
    state, metrics = step(state, gbatch["image_u8"], gbatch["is_clean"], jax.random.PRNGKey(0))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
