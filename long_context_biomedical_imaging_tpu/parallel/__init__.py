from .mesh import (batch_sharding, create_mesh, fetch_local_rows,
                   put_global_batch, replicated_sharding, shard_batch)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "put_global_batch", "fetch_local_rows"]
