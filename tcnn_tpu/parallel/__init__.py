from .data_parallel import DataParallelTrainer, create_mesh
from .distributed import (
    global_batch,
    global_mesh,
    host_shard_key,
    init_distributed,
)

__all__ = [
    "DataParallelTrainer",
    "create_mesh",
    "global_batch",
    "global_mesh",
    "host_shard_key",
    "init_distributed",
]
