"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY.md §2 C28-C29: no
torch.distributed anywhere).  This framework's first-class scaling strategy is
data parallelism over a 1-D ``('data',)`` mesh: the batch axis (training
crops, or concurrent recordings at inference) is sharded across chips, model
state is replicated, and XLA inserts the ICI collectives (gradient psum, BN
batch-stat all-reduce) automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a host batch onto the mesh, leading axis sharded."""
    return jax.device_put(batch, batch_sharding(mesh, axis_name))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
