from .mesh import (batch_sharding, make_mesh, param_spec, replicated,
                   shard_params)
from .sequence import mas_sequence_parallel

__all__ = ["batch_sharding", "make_mesh", "mas_sequence_parallel",
           "param_spec", "replicated", "shard_params"]
