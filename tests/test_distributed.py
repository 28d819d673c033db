"""parallel/distributed.py semantics on the 8-device virtual CPU mesh.

The reference has no distributed backend at all (SURVEY §2.8 / §5.8 — its
multi-GPU path raises NotImplementedError); these tests pin the multi-host
helpers' contract: global (data, space) mesh topology, host-local batch
assembly placement (mirroring mesh.shard_batch so the same pjit step serves
single- and multi-host), and a sharded computation consuming the result.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graspnerf_tpu.parallel import DATA_AXIS, SPACE_AXIS
from graspnerf_tpu.parallel.distributed import (global_mesh,
                                                host_local_batch_to_global,
                                                initialize)


def test_initialize_single_process_noop():
    initialize()                      # no args
    initialize(num_processes=1)       # explicit single process
    assert jax.process_count() == 1   # still single-process


def test_global_mesh_topology():
    mesh = global_mesh(n_space_per_host=4)
    assert mesh.axis_names == (DATA_AXIS, SPACE_AXIS)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[SPACE_AXIS] == 4
    # default: all local devices on space
    mesh_def = global_mesh()
    assert mesh_def.shape[SPACE_AXIS] == jax.local_device_count()
    assert mesh_def.shape[DATA_AXIS] == 1


def test_host_local_batch_to_global_placement():
    mesh = global_mesh(n_space_per_host=4)  # (data=2, space=4)
    batch = {
        "data": {"que": {"coords": np.arange(2 * 1 * 64 * 2, dtype=np.float32)
                         .reshape(2, 1, 64, 2)}},
        "sdf_gt": np.random.RandomState(0).rand(2, 8, 8, 8).astype(np.float32),
        "step_scalar": np.float32(3.0),
    }
    g = host_local_batch_to_global(mesh, batch)
    coords = g["data"]["que"]["coords"]
    sdf = g["sdf_gt"]
    # scene axis on data; rays additionally on space; scalars replicated
    assert coords.sharding.spec == P(DATA_AXIS, None, SPACE_AXIS)
    assert sdf.sharding.spec == P(DATA_AXIS)
    assert g["step_scalar"].sharding.spec == P()
    # single-process: global values == local values, bit-exact
    np.testing.assert_array_equal(np.asarray(coords),
                                  batch["data"]["que"]["coords"])
    np.testing.assert_array_equal(np.asarray(sdf), batch["sdf_gt"])

    # a jitted reduction over the assembled batch matches numpy
    with mesh:
        total = jax.jit(lambda c, s: jnp.sum(c) + jnp.sum(s))(coords, sdf)
    np.testing.assert_allclose(
        float(total),
        batch["data"]["que"]["coords"].sum() + batch["sdf_gt"].sum(),
        rtol=1e-6)


def test_host_local_batch_no_scene_axis():
    mesh = global_mesh(n_space_per_host=4)
    batch = {"coords": np.zeros((1, 64, 2), np.float32),
             "imgs": np.zeros((6, 16, 16, 3), np.float32)}
    g = host_local_batch_to_global(mesh, batch, scene_axis=False)
    assert g["coords"].sharding.spec == P(None, SPACE_AXIS)
    assert g["imgs"].sharding.spec == P()


def test_indivisible_scene_axis_replicates():
    mesh = global_mesh(n_space_per_host=4)  # data=2
    batch = {"odd": np.zeros((3, 4), np.float32)}  # 3 scenes, data=2
    g = host_local_batch_to_global(mesh, batch)
    assert g["odd"].sharding.spec == P()
