from tpufcn.parallel.distributed import (
    initialize_distributed, shard_params_replicated, spatial_infer_sharding)

__all__ = [
    "initialize_distributed", "shard_params_replicated",
    "spatial_infer_sharding",
]
