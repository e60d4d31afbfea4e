from .mesh import make_mesh, batch_sharding, replicated, shard_batch
from .farm import render_farm
from .distributed import init_distributed, is_multiprocess

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "render_farm", "init_distributed", "is_multiprocess"]
