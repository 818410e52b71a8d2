"""Device mesh + sharding helpers.

The reference's only parallelism is single-node DDP over NCCL
(train.py:261-262): the global ray batch splits across GPUs and gradients
all-reduce. Rays are embarrassingly parallel, so the TPU-native equivalent
is a 1-D `data` mesh: ray batches shard over it, parameters replicate, and
XLA inserts the gradient `psum` over ICI automatically when the train step
is jitted with these shardings. Multi-host extends the same axis over DCN
via `jax.distributed` — no user-code changes.

Pallas on multi-chip meshes: GSPMD has no partitioning rule for
`tpu_custom_call`, so the kernel launchers in ops/pallas_mlp(_vjp).py
shard_map THEMSELVES over the mesh's ray axis whenever a >1-device mesh is
passed (RenderSettings.shard_mesh, set by ObjectNeRFSystem). Parameters
replicate into each shard, per-ray outputs stay sharded, and the backward
kernel psums its weight gradients over the mesh — so the fused fast path
(train split step, eval stages, edit renderer) runs SPMD on every mesh
size with no configuration changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: join the jax.distributed cluster so
    `jax.devices()` spans every host's chips and the `data` mesh axis rides
    ICI within a slice and DCN across slices. On single-host TPU VMs (or
    when the env provides coordination, e.g. GKE) argument-free init works.

    Returns the global device count. Safe to call when already initialized.
    """
    try:
        if coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except RuntimeError as e:  # already initialized / single-process run
        if "already" not in str(e).lower():
            raise
    return len(jax.devices())


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
