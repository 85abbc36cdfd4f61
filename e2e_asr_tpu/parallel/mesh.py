"""Device mesh + sharding layout for SPMD data-parallel training.

The reference is strictly single-device (SURVEY §2.2: no DDP, no
torch.distributed anywhere); scale-out here is first-class and TPU-native:

- a `Mesh(('data', 'model'))` over all devices (model axis reserved for
  tensor-parallel projections; size 1 in the v1 recipes),
- batches sharded over 'data' (leading axis), parameters replicated,
- `jax.jit` with these shardings makes XLA insert the gradient all-reduce
  over ICI within a slice and DCN across hosts — no hand-written
  collectives in the training path,
- multi-host: every process runs the same program; the input pipeline
  feeds each process its shard (data/dataset.py process_index/count) and
  `make_global_batch` assembles the global array from per-host shards.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    dev_array = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for every batch leaf."""
    return NamedSharding(mesh, P("data"))


def make_global_batch(mesh: Mesh, local_batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Assemble the global data-parallel batch from this process's shard.

    Single-process: a plain `device_put` with the batch sharding (the local
    batch IS the global batch). Multi-process (`jax.process_count() > 1`):
    every process holds only its per-host rows (data/dataset.py shards
    utterances by process_index), and
    `jax.make_array_from_process_local_data` stitches them into one global
    jax.Array whose leading axis is sharded over the mesh's 'data' axis —
    the global shape is local_rows * process_count. Each process's rows land
    on its own addressable devices, so no cross-host data movement happens
    here; XLA's gradient all-reduce is the only inter-host traffic.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in local_batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in local_batch.items()
    }


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Place a batch with the data-parallel layout (alias of
    make_global_batch; `batch` is the process-local shard when
    process_count > 1)."""
    return make_global_batch(mesh, batch)


def local_rows(arr: jax.Array) -> np.ndarray:
    """This process's rows of a leading-axis-sharded global array.

    Multi-process jax.Arrays are not fully addressable (np.asarray raises);
    each process reads back exactly the row block it contributed through
    make_array_from_process_local_data — the rows matching its loader-local
    batch. Shards are stitched in global row order.
    """
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allmean_scalars(values: np.ndarray) -> np.ndarray:
    """Mean of a small host float vector across processes (single-process:
    identity). Used to aggregate validation metrics so every process takes
    IDENTICAL best-checkpoint decisions (divergent decisions would desync
    the collective checkpoint save)."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(values)).mean(axis=0)


def allsum_scalars(values: np.ndarray) -> np.ndarray:
    """Sum of a small host float vector across processes."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(values)).sum(axis=0)


def pad_batch_to(batch: Dict[str, np.ndarray], b: int) -> Dict[str, np.ndarray]:
    """Pad batch rows to a multiple usable by the mesh (masked rows)."""
    cur = next(iter(batch.values())).shape[0]
    if cur == b:
        return batch
    assert b > cur
    return {
        k: np.concatenate([v, np.zeros((b - cur,) + v.shape[1:], v.dtype)])
        for k, v in batch.items()
    }
