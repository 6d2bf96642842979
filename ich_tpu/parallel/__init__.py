from ich_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]

# Sharded-inference entry points live in ich_tpu.parallel.sharded_inference
# (imported lazily by callers: sliding_window_inference_sharded,
# sliding_window_inference_volume_parallel).
