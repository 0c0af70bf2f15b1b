from .mesh import (active_mesh, batch_sharding, constrain, create_mesh,
                   fetch_local_rows, model_axis_size, put_global_batch,
                   replicated_sharding, set_active_mesh, shard_batch,
                   shard_channels, shard_tokens, use_active_mesh)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "put_global_batch", "fetch_local_rows",
           "active_mesh", "set_active_mesh", "use_active_mesh",
           "model_axis_size", "constrain", "shard_tokens", "shard_channels"]
