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
    "shard_batch_local",
    "replicate",
    "host_local_rows",
]

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN). No-op for single-process runs.

    Exercised end to end (multiple local processes + a coordinator, CPU
    collectives over gloo) by parallel/multihost.py -- `python -m
    qbold_vi_tpu dryrun --processes N`, `train --coordinator ...` and
    tests/test_multihost.py."""
    if coordinator_address is None:
        return
    try:
        # cross-process CPU collectives need gloo; harmless for TPU
        # backends (the knob only affects the CPU client)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
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


def host_local_rows(sharding: NamedSharding, global_shape,
                    dim: int = 0) -> tuple[int, int]:
    """The contiguous ``[lo, hi)`` row range of a ``dim``-sharded global
    array that THIS process's addressable devices own. The per-host
    data-sharding primitive: a host only needs to load/transfer its own
    range (jax.devices() orders devices process-contiguously, so the
    union of local shards is one contiguous slice -- asserted)."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    los, his = [], []
    for idx in idx_map.values():
        s = idx[dim]
        los.append(s.start or 0)
        his.append(global_shape[dim] if s.stop is None else s.stop)
    lo, hi = min(los), max(his)
    span = sum(h - l for l, h in zip(los, his))
    assert span == hi - lo, (
        f"process-local shards are not contiguous on dim {dim}: {idx_map}")
    return lo, hi


def _put_sharded(x: np.ndarray, sharding: NamedSharding, dim: int):
    """device_put for single-process; make_array_from_process_local_data
    (each host contributes only its addressable rows) when the mesh
    spans processes -- device_put cannot write non-addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    lo, hi = host_local_rows(sharding, x.shape, dim)
    local = x[(slice(None),) * dim + (slice(lo, hi),)]
    return jax.make_array_from_process_local_data(sharding, local, x.shape)


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS,
                time_axis: bool = False) -> Any:
    """Device-put a pytree of host arrays, sharded on the leading axis
    (or on axis 1 when ``time_axis`` -- for (T, B, ...) epoch stacks fed
    to scan-based whole-epoch steps).

    The sharded dim must be divisible by the mesh size (callers pad or
    pick batch sizes accordingly; static shapes keep XLA happy). Under a
    multi-process mesh each host transfers ONLY its addressable rows of
    the (host-global) arrays; a host that wants to avoid even
    MATERIALISING other hosts' rows uses shard_batch_local."""
    def put(x):
        x = np.asarray(x)
        if time_axis:
            spec = P(None, axis_name, *([None] * (x.ndim - 2)))
            return _put_sharded(x, NamedSharding(mesh, spec), 1)
        return _put_sharded(x, batch_sharding(mesh, x.ndim, axis_name), 0)
    return jax.tree_util.tree_map(put, batch)


def shard_batch_local(mesh: Mesh, local_batch: Any, global_rows: int,
                      axis_name: str = DATA_AXIS) -> Any:
    """Per-host data feeding: each process passes ONLY its own leading-
    axis rows (e.g. the subject shard it loaded from disk) of a
    leading-sharded global batch with ``global_rows`` total rows.

    The multi-host input-pipeline primitive (SURVEY.md SS5.8): no host
    ever loads or ships another host's data over DCN. Row counts are
    validated against the mesh's addressable range; returns globally-
    sharded jax.Arrays usable exactly like shard_batch's output."""
    def put(x):
        x = np.asarray(x)
        sh = batch_sharding(mesh, x.ndim, axis_name)
        gshape = (global_rows,) + x.shape[1:]
        lo, hi = host_local_rows(sh, gshape, 0)
        if x.shape[0] != hi - lo:
            raise ValueError(
                f"process {jax.process_index()} passed {x.shape[0]} local "
                f"rows but its devices own rows [{lo}, {hi}) of "
                f"{global_rows}")
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x, gshape)
    return jax.tree_util.tree_map(put, local_batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh (every host
    holds the full value -- multi-process safe)."""
    sh = replicated_sharding(mesh)

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)
    return jax.tree_util.tree_map(put, tree)
