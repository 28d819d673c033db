"""Worker for the real multi-process jax.distributed test.

Spawned by tests/test_multiprocess.py as N separate interpreters. Each process
calls parallel.distributed.initialize() (the first real multi-process exercise
of that wrapper), builds the global (data, space) mesh, assembles a per-host
batch with host_local_batch_to_global, and runs one psum-reduction over it.
Process 0 prints the results for the parent to assert on.

argv: coordinator_address num_processes process_id local_devices
"""
import os
import sys

addr, nproc, pid, ndev = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                          int(sys.argv[4]))
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={ndev}").strip()

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graspnerf_tpu.parallel import DATA_AXIS, SPACE_AXIS
from graspnerf_tpu.parallel.distributed import (global_mesh,
                                                host_local_batch_to_global,
                                                initialize)

initialize(coordinator_address=addr, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == ndev

# one scene per process, identifiable content: scene s (global) is filled
# with value s+1. Default topology: data across hosts, space within a host.
mesh = global_mesh()
assert mesh.shape[DATA_AXIS] == nproc
assert mesh.shape[SPACE_AXIS] == ndev

local = {
    "sdf_gt": np.full((1, 4, 4, 4), pid + 1.0, np.float32),
    "data": {"que": {"coords": np.full((1, 1, 8 * ndev, 2), pid + 1.0,
                                       np.float32)}},
    "scalar": np.float32(7.0),
}
g = host_local_batch_to_global(mesh, local)
assert g["sdf_gt"].shape == (nproc, 4, 4, 4)
assert g["data"]["que"]["coords"].sharding.spec == P(DATA_AXIS, None,
                                                     SPACE_AXIS)

with jax.set_mesh(mesh):
    out = jax.jit(
        lambda s, c: (jnp.sum(s), jnp.mean(c)),
        out_shardings=NamedSharding(mesh, P()),
    )(g["sdf_gt"], g["data"]["que"]["coords"])
    jax.block_until_ready(out)

total, mean = float(out[0]), float(out[1])
# sum over scenes filled with 1..nproc: sum_s (s+1)*64
expect_total = sum((s + 1) * 64 for s in range(nproc))
expect_mean = sum(s + 1 for s in range(nproc)) / nproc
assert abs(total - expect_total) < 1e-4, (total, expect_total)
assert abs(mean - expect_mean) < 1e-5, (mean, expect_mean)

# indivisible scene axis must raise (ADVICE r4: silent divergent replication).
# Mesh with data = all devices → per-process data share = ndev > 1; a 3-scene
# local batch (3 % ndev != 0 for even ndev) must error, not replicate.
mesh2 = global_mesh(n_space_per_host=1)
assert mesh2.shape[DATA_AXIS] == nproc * ndev
try:
    host_local_batch_to_global(mesh2, {"bad": np.zeros((3, 2), np.float32)})
    raised = False
except ValueError:
    raised = True
assert raised, "indivisible scene axis did not raise"

if pid == 0:
    print(f"MP_OK total={total} mean={mean} procs={jax.process_count()}",
          flush=True)
