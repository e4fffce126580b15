from .distributed import (
    initialize_multihost as initialize_multihost,
    sharded_sampler as sharded_sampler,
)
from .mesh import (
    batch_sharding as batch_sharding,
    make_mesh as make_mesh,
    params_sharding as params_sharding,
    replicated as replicated,
    shard_batch as shard_batch,
    shard_params as shard_params,
)
