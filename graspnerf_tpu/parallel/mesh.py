"""Device-mesh construction and sharding rules.

The reference has no working parallelism (its 'multi-GPU' path raises
NotImplementedError — ref trainer.py:77-78); parallelism here is first-class:

  mesh axes: (data, space)
    data  — scenes (batch) are split across this axis
    space — rays / TSDF voxels are split across this axis ("sequence
            parallelism" for a renderer: per-ray work is independent, the
            per-view reduction axis V=6 stays local)

Parameters and the small source-view feature maps (6×32×H/4×W/4 ≈ MBs) are
replicated; the only cross-device traffic is the gradient psum over both axes,
which XLA overlaps with the backward pass.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_data: Optional[int] = None, n_space: Optional[int] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices. Default: all devices on `space`
    (single-scene training, like the reference's batch=1)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_space is None:
        n_data, n_space = 1, n
    elif n_data is None:
        n_data = n // n_space
    elif n_space is None:
        n_space = n // n_data
    assert n_data * n_space == n, (n_data, n_space, n)
    arr = np.asarray(devices).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, scene_axis: bool = False):
    """Place a training batch on the mesh.

    scene_axis=False (single scene, ref batch_size=1): everything replicated
    except ray coords, whose ray axis splits on `space`.

    scene_axis=True (scene-batched): the leading scene axis of EVERY array
    shards on `data`; ray coords additionally split rays on `space`
    (coords [S, qn, rn, 2] → P(data, None, space)). The scene count must be a
    multiple of the data-axis size.
    """
    n_data = mesh.shape[DATA_AXIS]

    def spec_for(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        lead = (DATA_AXIS,) if scene_axis else ()
        if scene_axis and (np.ndim(x) == 0 or x.shape[0] % n_data != 0):
            return NamedSharding(mesh, P())
        if name == "coords":
            # rays on space: [*, qn, rn, 2]
            return NamedSharding(mesh, P(*lead, None, SPACE_AXIS))
        if not scene_axis:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*lead))

    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, spec_for(p, x)), batch)
