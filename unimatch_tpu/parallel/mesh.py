"""Device mesh and sharding helpers.

The reference scales with DistributedDataParallel over NCCL
(utils/dist_utils.py, main_flow.py:187-199). The TPU-native equivalent is a
jax.sharding Mesh with a `data` axis over ICI: the global batch is sharded
across the axis, parameters are replicated, and XLA inserts the gradient
all-reduce (the DDP allreduce) automatically from sharding constraints on a
jit'd train step.

A second optional `model` axis is reserved for spatial/tensor sharding of
the cost volume at very high resolutions (a capability the reference lacks).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""
    sharding = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def init_distributed(coordinator_address=None, num_processes=None, process_id=None) -> None:
    """Multi-host initialization (reference utils/dist_utils.py equivalent).

    On TPU pods the runtime supplies everything and jax.distributed.initialize
    takes no arguments; explicit args support other launchers (the reference's
    MPI/SLURM bootstraps map onto these three parameters).
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except Exception:
        pass  # single-process run
