"""Device mesh + sharding policy.

TPU-native replacement for torchrun/NCCL DDP (ref: setup/setup_utils.py:65-85,
trainer/trainer_base.py:94-98): one global `jax.sharding.Mesh` whose 'data'
axis spans all chips (ICI within a slice, DCN across slices). The compiled
train step consumes batches sharded over 'data' with replicated params — XLA
inserts the gradient all-reduce that DDP's bucketed NCCL all-reduce performed.

A 'model' axis is provisioned for tensor-parallel sharding of qkv/mlp matmuls
(the reference has no TP; mesh_shape=(N,1) keeps it inert until used).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())
    n = devices.size
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, \
        f"mesh {data_parallel}x{model_parallel} != {n} devices"
    return Mesh(devices.reshape(data_parallel, model_parallel), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host numpy batches with the batch axis sharded over 'data'.

    Pads nothing: callers guarantee batch % data-axis == 0 (the loader pads
    ragged final batches to the static batch size).
    """
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
