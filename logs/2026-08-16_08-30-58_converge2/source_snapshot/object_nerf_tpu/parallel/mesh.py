"""Device mesh + sharding helpers.

The reference's only parallelism is single-node DDP over NCCL
(train.py:261-262): the global ray batch splits across GPUs and gradients
all-reduce. Rays are embarrassingly parallel, so the TPU-native equivalent
is a 1-D `data` mesh: ray batches shard over it, parameters replicate, and
XLA inserts the gradient `psum` over ICI automatically when the train step
is jitted with these shardings. Multi-host extends the same axis over DCN
via `jax.distributed` — no user-code changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every array's leading axis over the data mesh.

    Leading dims must be divisible by the mesh size — the dataset pipeline
    pads ray batches to guarantee this.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
