"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL data parallelism
(reference: distributed.py:126-173, multiproc.py): instead of per-GPU
processes with bucketed gradient all-reduce hooks, we lay a
``jax.sharding.Mesh`` over all chips, shard the batch along the ``data``
axis, replicate parameters, and let XLA insert the gradient all-reduces over
ICI inside the jitted train step. Multi-host entry is
``jax.distributed.initialize`` (one process per host) — no launcher needed.

The mesh is 1-D today; the axis tuple is written so tensor axes can be added
without touching call sites.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"only {len(devices)} visible")
    return Mesh(devices[:n].reshape(tuple(shape)), tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_rows(batch, multiple: int):
    """Repeat-pad the batch dim to a device-divisible row count.

    Validation loaders keep remainder batches (drop_last=False, reference
    train.py:100-111); an N-device data sharding needs rows % N == 0 in
    every process count. Duplicated tail rows bias the batch-mean metrics
    negligibly; the training loader uses drop_last=True and never pads.
    """
    rows = np.asarray(jax.tree.leaves(batch)[0]).shape[0]
    pad_n = (-rows) % multiple
    if pad_n == 0:
        return batch

    def pad(x):
        x = np.asarray(x)
        return np.concatenate([x, np.repeat(x[-1:], pad_n, axis=0)], axis=0)

    return jax.tree.map(pad, batch)


def shard_batch(batch, mesh: Mesh):
    """Device-put every array in a batch pytree with the batch dim sharded.

    Multi-process: every process holds the SAME global batch (loaders are
    seeded identically, the reference's DistributedSampler analogue); each
    contributes the row-range owned by its addressable devices via
    ``make_array_from_process_local_data`` (device_put cannot target another
    process's devices).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    pid, n = jax.process_index(), jax.process_count()

    def put(x):
        x = np.asarray(x)
        rows = x.shape[0]
        assert rows % n == 0, (rows, n)
        local = x[pid * (rows // n):(pid + 1) * (rows // n)]
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree.map(put, batch)


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh (all processes hold
    identical values — same PRNG seed everywhere)."""
    sharding = replicate_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), state)
