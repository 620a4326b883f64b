from .mesh import (make_mesh, shard_batch, shard_global_batch,
                   replicate)
