from .mesh import (batch_sharding, make_mesh, param_shardings,
                   param_partition_spec, replicated, shard_params)

__all__ = ["batch_sharding", "make_mesh", "param_shardings",
           "param_partition_spec", "replicated", "shard_params"]
