from .mesh import make_mesh, shard_batch, replicate, data_sharding

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]
