from .mesh import make_mesh, shard_batch, replicate, DATA_AXIS, SPACE_AXIS
from .distributed import initialize, global_mesh, host_local_batch_to_global
