"""Device-mesh helpers for data-parallel scaling over ICI/DCN.

The duck workload's parallelism axis is the env batch ("data"); see
ARCHITECTURE.md. These helpers centralize mesh creation, multi-host
initialization, and batch sharding so callers never touch raw device lists.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (env/batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) bring-up: call once per host before building meshes.
    No-op in single-process runs. XLA routes the data-axis collectives over
    ICI within a slice and DCN across hosts; no external comm library."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Device-put a host pytree with its leading axis sharded over the mesh."""
    return jax.device_put(tree, data_sharding(mesh, axis))
