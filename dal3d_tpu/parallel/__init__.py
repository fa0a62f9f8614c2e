from .mesh import make_mesh, batch_sharding, replicate_sharding, shard_batch
from .dist import get_dist_info, master_only, all_gather_objects, synchronize

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "get_dist_info",
    "master_only",
    "all_gather_objects",
    "synchronize",
]
