from baddiffusion_tpu.parallel.distributed import (
    global_batch_from_host_shards,
    host_shard_slice,
    initialize,
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
]
