"""Multi-host initialization + cross-host sharding helpers.

The reference has no distributed backend at all (§SURVEY 2.8; its multi-GPU
path raises NotImplementedError). Here multi-host runs use jax.distributed:
every host calls `initialize()` (one process per host), builds the global
(data, space) mesh over all devices, and feeds host-local batches via
`host_local_batch_to_global`.

Topology guidance: keep `space` (rays/voxels — latency-sensitive psum of
gradients only) within a host's ICI domain and put `data` across hosts so the
only DCN traffic is the gradient all-reduce, which XLA overlaps with backward.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, SPACE_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Idempotent jax.distributed.initialize wrapper; no-op single-process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_space_per_host: Optional[int] = None) -> Mesh:
    """(data, space) mesh over all global devices: space within a host,
    data across hosts (DCN only carries the gradient all-reduce)."""
    devices = np.asarray(jax.devices())
    per_host = n_space_per_host or jax.local_device_count()
    n_data = devices.size // per_host
    return Mesh(devices.reshape(n_data, per_host), (DATA_AXIS, SPACE_AXIS))


def host_local_batch_to_global(mesh: Mesh, batch, scene_axis: bool = True,
                               ray_keys=("coords",)):
    """Assemble a global array batch from per-host local batches.

    Mirrors mesh.shard_batch's placement so the same pjit train step works
    single- and multi-host: with scene_axis, the leading scene axis of every
    array shards over `data` (each process contributes its local scenes);
    ray arrays ([*, qn, rn, 2]) additionally split rays over `space`.
    Scalars (and everything when scene_axis=False except ray arrays)
    replicate — every process must then pass identical values."""
    n_data = mesh.shape[DATA_AXIS]

    def put(path, x):
        x = np.asarray(x)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        lead = (DATA_AXIS,) if scene_axis else ()
        if scene_axis and (x.ndim == 0 or x.shape[0] % max(
                n_data // jax.process_count(), 1) != 0):
            # Scalars replicate (every host passes identical values). But a
            # non-divisible scene axis must NOT silently replicate: per-host
            # batches differ by construction, so multi-process replication
            # would assemble an array whose shards disagree across hosts.
            if x.ndim > 0 and jax.process_count() > 1:
                raise ValueError(
                    f"{name}: leading scene axis {x.shape[0]} is not "
                    f"divisible by the per-process data-axis share "
                    f"({n_data}//{jax.process_count()}); pad the host-local "
                    "batch instead of replicating divergent data")
            spec = P()
        elif name in ray_keys:
            spec = P(*lead, None, SPACE_AXIS)
        elif scene_axis:
            spec = P(*lead)
        else:
            spec = P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)
    return jax.tree_util.tree_map_with_path(put, batch)
