from .sharding import (
    solver_mesh,
    shard_ell,
    shard_operator,
    replicate,
    shard_vector,
)
