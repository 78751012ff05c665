"""Device-mesh helpers: the framework's single distributed-communication
component (SURVEY.md §5 "distributed communication backend").

Replaces the reference's NCCL-via-Lightning-Fabric collectives
(fabric_trainer.py:32-38,78-81,248-256) and its SLURM multi-node pattern
with one ``jax.distributed`` + ``Mesh`` surface: data-parallel training
shards batches over ``data`` (XLA inserts psum/all-gather over ICI),
inference shards z-slabs the same way, and multi-host runs initialize
``jax.distributed`` and fan runs out over DCN via the DevicePool.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n local/global devices.

    With one axis the mesh is a flat ring (ICI-friendly on a v5e slice);
    with two (e.g. ("data", "model")) pass ``shape`` to factor devices.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if shape is not None:
        arr = arr.reshape(tuple(shape))
    elif len(axis_names) > 1:
        raise ValueError("multi-axis mesh needs an explicit shape")
    return Mesh(arr, tuple(axis_names))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of host arrays with the leading dim sharded on
    ``axis`` (z-slices or examples over chips)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
