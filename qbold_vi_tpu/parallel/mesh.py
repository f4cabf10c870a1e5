"""Device mesh + sharding utilities: voxel-batch data parallelism.

The reference has no distributed layer at all (SURVEY.md SS2.3; grep
confirms zero tf.distribute/NCCL/MPI usage) -- qBOLD inference is
embarrassingly parallel across voxels, so the TPU framework introduces
data parallelism as a first-class component here:

* one 1-D ``Mesh`` over all local (or provided) devices, axis ``"data"``;
* batches sharded on their leading axis (`P("data")`), parameters
  replicated (`P()`) -- the encoder is tiny (tens of kLoC params at the
  published config), so TP/PP would only add collective latency;
* train steps are plain jitted functions; jit's in/out shardings make
  XLA insert the ``psum`` gradient reductions over ICI automatically
  (the scaling-book recipe: pick a mesh, annotate, let XLA place
  collectives).

Multi-host entry (``jax.distributed``) is wrapped behind
``initialize_distributed`` so single-host use needs no setup.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN). No-op for single-process runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all devices (ICI-contiguous order)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 1,
                   axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for an ndim-dimensional batch array."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS,
                time_axis: bool = False) -> Any:
    """Device-put a pytree of host arrays, sharded on the leading axis
    (or on axis 1 when ``time_axis`` -- for (T, B, ...) epoch stacks fed
    to scan-based whole-epoch steps).

    The sharded dim must be divisible by the mesh size (callers pad or
    pick batch sizes accordingly; static shapes keep XLA happy)."""
    def put(x):
        x = np.asarray(x)
        if time_axis:
            spec = P(None, axis_name, *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
