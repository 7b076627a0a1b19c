from dan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    place_replicated,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "place_replicated",
    "replicated",
    "shard_batch",
]
