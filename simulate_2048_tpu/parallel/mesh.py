"""Mesh construction and sharding helpers.

The reference has no multi-device code at all (SURVEY.md §2.6: no pmap/
shard_map/pjit/Mesh anywhere). This module is the TPU-native parallelism
foundation: one named mesh axis ``"data"`` spanning all chips (ICI within a
slice, DCN across hosts handled transparently by jax.distributed), with
helpers to place batches and replicate parameters.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place every leaf with its leading dim sharded over ``axis_name``."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize``.

    On TPU pods the arguments are auto-detected from the environment; flags
    exist for manual bring-up (e.g. CPU-based integration tests).
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = {
            "coordinator_address": coordinator,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    jax.distributed.initialize(**kwargs)
