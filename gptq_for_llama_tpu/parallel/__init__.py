"""Device-mesh parallelism: TP shardings of packed weights and KV caches."""

from .sharding import make_mesh, shard_cache, shard_model_params, shard_packed_linear

__all__ = ["make_mesh", "shard_cache", "shard_model_params",
           "shard_packed_linear"]
