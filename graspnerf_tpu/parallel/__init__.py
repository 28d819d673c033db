from .mesh import make_mesh, shard_batch, replicate, DATA_AXIS, SPACE_AXIS
