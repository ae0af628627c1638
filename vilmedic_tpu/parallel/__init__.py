from .mesh import (  # noqa: F401
    get_mesh,
    init_distributed,
    process_allgather,
    replicate,
    shard_batch,
)
from .sharding import param_specs, shard_params  # noqa: F401
