from .mesh import make_mesh, batch_sharding, replicated, shard_batch
from .farm import render_farm

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "render_farm"]
