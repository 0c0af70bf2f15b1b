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

import contextlib
import warnings

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
    mesh = Mesh(devices.reshape(data_parallel, model_parallel), ("data", "model"))
    # Only a >1 'model' axis changes model-code behavior (constrain() starts
    # sharding and fused kernels step aside); plain DP meshes must not touch
    # process-global state, or an unrelated mesh build would silently knock
    # every later-traced model off the fused Pallas paths.
    if model_parallel > 1:
        set_active_mesh(mesh)
    return mesh


# ---------------------------------------------------------------------------- #
# Sequence (token-axis) parallelism over the 'model' axis
#
# The reference handles long context purely algorithmically (SURVEY §5.7);
# beyond-HBM ViT contexts additionally shard the token axis across ICI. Model
# code stays mesh-agnostic: it calls `constrain(x, spec)` which no-ops unless
# a mesh with a >1 'model' axis is active. Inside jit, XLA's SPMD partitioner
# then materializes the needed collectives (halo permutes for the short conv's
# shifted slices, all-to-alls at the token<->channel re-shard around the
# depthwise long conv, a psum for the mean-pool head).
# ---------------------------------------------------------------------------- #

_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextlib.contextmanager
def use_active_mesh(mesh: Mesh | None):
    """Scope the active mesh: restores the previous value on exit, so tests
    and notebooks can trace sequence-parallel models without leaking the
    model-axis gate into every later trace in the process."""
    prev = _ACTIVE_MESH
    set_active_mesh(mesh)
    try:
        yield mesh
    finally:
        set_active_mesh(prev)


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def model_axis_size() -> int:
    m = _ACTIVE_MESH
    return int(m.shape["model"]) if m is not None else 1


def constrain(x, *spec):
    """with_sharding_constraint against the active mesh; identity when the
    'model' axis is 1/absent or the sharded dims don't divide evenly (the
    fallback warns: a silently replicated tensor defeats the beyond-HBM
    sharding the user asked for, so the non-divisible geometry must be
    visible, once per trace)."""
    m = _ACTIVE_MESH
    if m is None or int(m.shape.get("model", 1)) == 1:
        return x
    for dim, s in enumerate(spec):
        if s is None:
            continue
        size = int(np.prod([m.shape[a] for a in
                            ((s,) if isinstance(s, str) else s)]))
        if x.shape[dim] % size:
            warnings.warn(
                f"sequence-parallel constraint P{spec} skipped for shape "
                f"{x.shape}: dim {dim} ({x.shape[dim]}) is not divisible by "
                f"the mesh axis product {size}; the tensor stays replicated "
                f"on every chip. Pick a geometry whose token/channel counts "
                f"divide --model_parallel.", stacklevel=2)
            return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P(*spec)))


def shard_tokens(x, token_axis: int = 1):
    """(B, L, D)-style activations: batch over 'data', tokens over 'model'."""
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[token_axis] = "model"
    return constrain(x, *spec)


def shard_channels(x, channel_axis: int = -1):
    """Re-shard to channel-parallel (tokens fully local) for depthwise ops."""
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[channel_axis % x.ndim] = "model"
    return constrain(x, *spec)


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


def put_global_batch(mesh: Mesh, *arrays, accum: bool = False):
    """Assemble per-process host batches into global batch-sharded arrays.

    Single-process: a plain device_put with the batch axis over 'data'.
    Multi-process: each process's loader holds a disjoint pi::pc block of the
    global batch (data/loader.py, like the reference's DistributedSampler
    per-rank batches, trainer_base.py:126-135); the blocks compose into one
    global array via jax.make_array_from_process_local_data — device_put would
    wrongly treat the local block as the whole global array.

    accum=True marks (accum, B, ...) stacked microbatch groups: the *batch*
    axis (axis 1) shards, not the microbatch axis the scan iterates over.
    """
    spec = P(None, "data") if accum else P("data")
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        out = tuple(jax.make_array_from_process_local_data(sharding, a)
                    for a in arrays)
    else:
        out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def fetch_local_rows(array) -> np.ndarray:
    """Fetch this process's rows of a batch-sharded global array as numpy.

    Multi-host jax.device_get on a non-fully-addressable array raises; each
    process only needs its own samples (metrics are per-rank then reduced,
    like the reference, metrics_base.py:191-206). Addressable shards are
    concatenated in global batch order; replicated-over-'model' duplicates
    are dropped by keying on the global row slice.
    """
    if jax.process_count() <= 1:
        return np.asarray(jax.device_get(array))
    by_row = {}
    for s in array.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_row:
            by_row[start] = np.asarray(jax.device_get(s.data))
    return np.concatenate([by_row[k] for k in sorted(by_row)], axis=0)
