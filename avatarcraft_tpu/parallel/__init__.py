from avatarcraft_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from avatarcraft_tpu.parallel.table_mp import (
    make_table_mp_train_step,
    shard_grid_rows,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "shard_grid_rows",
    "make_table_mp_train_step",
]
