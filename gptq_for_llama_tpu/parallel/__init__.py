"""Device-mesh parallelism: TP shardings of packed weights and KV caches."""

from .sharding import make_mesh, shard_cache, shard_model_params, shard_packed_linear
from .tp_ops import tp_quant_matmul

__all__ = ["make_mesh", "shard_cache", "shard_model_params",
           "shard_packed_linear", "tp_quant_matmul"]
