from baddiffusion_tpu.parallel.distributed import (
    global_batch_from_host_shards,
    host_shard_slice,
    initialize,
)
from baddiffusion_tpu.parallel.sharding_rules import (
    fsdp_param_specs,
    place_train_state,
    shard_params,
    shard_state_fsdp,
    train_state_shardings,
    train_state_specs,
    unet_param_specs,
)
from baddiffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "initialize",
    "host_shard_slice",
    "global_batch_from_host_shards",
    "unet_param_specs",
    "shard_params",
    "fsdp_param_specs",
    "shard_state_fsdp",
    "train_state_specs",
    "train_state_shardings",
    "place_train_state",
]
