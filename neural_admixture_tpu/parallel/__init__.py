from .mesh import make_mesh, shard_params, DATA_AXIS, SNP_AXIS  # noqa: F401
