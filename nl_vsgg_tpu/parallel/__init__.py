from .distributed import (DistributedBatcher, allgather_obj, init_distributed,
                          is_primary, merge_evaluators)
from .mesh import (batch_sharding, make_mesh, param_shardings, replicated,
                   shard_batch, shard_state)
from .sttran_sp import sttran_transformer_sharded

__all__ = ["batch_sharding", "make_mesh", "param_shardings", "replicated",
           "shard_batch", "shard_state", "sttran_transformer_sharded",
           "DistributedBatcher", "allgather_obj", "init_distributed",
           "is_primary", "merge_evaluators"]
