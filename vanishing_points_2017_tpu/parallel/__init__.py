from .mesh import make_mesh, shard_params, shard_batch  # noqa: F401
from .inference import sharded_pipeline_full  # noqa: F401
