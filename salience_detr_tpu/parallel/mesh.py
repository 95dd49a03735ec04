"""Device mesh and sharding helpers.

Replaces the reference's NCCL/Accelerate distributed substrate (SURVEY.md
§2.12) with GSPMD: a 1-D ``dp`` mesh shards the global batch; parameters are
replicated; gradient all-reduce is inserted by XLA (riding ICI within a
slice, DCN across slices).  Scalar metric reductions are plain global
computations inside the jitted step — no explicit collectives needed.

Multi-host entry: call :func:`init_distributed` before device queries
(equivalent of /root/reference/util/utils.py:330-355's init_distributed_mode).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for multi-host meshes; no-op when single
    process and no coordinator is configured."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
