from .mesh import (batch_sharding, make_mesh, param_shardings, replicated,
                   shard_batch, shard_state)

__all__ = ["batch_sharding", "make_mesh", "param_shardings", "replicated",
           "shard_batch", "shard_state"]
