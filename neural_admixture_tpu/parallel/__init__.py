from .mesh import make_mesh, shard_params, shard_batch, DATA_AXIS, SNP_AXIS  # noqa: F401
