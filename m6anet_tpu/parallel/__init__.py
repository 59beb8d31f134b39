from .mesh import DATA_AXIS, make_mesh, read_sharding, replicated, shard_params  # noqa: F401
