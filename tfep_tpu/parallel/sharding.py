"""Device-mesh sharding for TFEP training (GSPMD/pjit data parallelism).

The scaling dimension of TFEP is trajectory frames x atoms (SURVEY §5):
there is no sequence axis and the flow itself is small, so the device-side
strategy is frame-axis data parallelism — batches sharded over the mesh's
``dp`` axis, parameters replicated, with XLA inserting the ``psum`` for the
loss/gradient reductions. These helpers build the mesh and shardings; the
per-sample engine fan-out (host side) composes with them by giving each host
its own shard of frames.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding',
           'shard_batch', 'replicate']

BATCH_AXIS = 'dp'


def make_mesh(n_devices: Optional[int] = None, axis_name: str = BATCH_AXIS
              ) -> Mesh:
    """1-D device mesh over the frame (data) axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding for per-sample arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = BATCH_AXIS) -> dict:
    """Place a host batch dict onto the mesh, frames split across devices."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree (e.g. the flow) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
