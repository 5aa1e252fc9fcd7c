"""Mesh construction and sharding helpers for data-parallel training."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-D ``('data',)`` by default; pass ``shape``/``axis_names`` for a 2-D
    ``('data', 'depth')`` layout.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (ray) axis over ``axis``."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, small tables)."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading axis of every array in a pytree over ``axis``."""
    sharding = batch_sharding(mesh, axis)
    return jax.device_put(tree, sharding)
