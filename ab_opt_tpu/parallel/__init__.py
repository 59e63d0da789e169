"""Device-mesh parallelism (replaces the reference's Ray fan-out; SURVEY §2.7)."""
from .mesh import (
    make_mesh,
    auto_mesh_for_batch,
    shard_batch,
    replicate,
    replicate_batch,
    sharded_sample_fn,
    sharded_train_step,
)
from .distributed import (
    init_distributed,
    global_mesh,
    host_batch_slice,
    global_batch_from_host_shards,
)

__all__ = [k for k in dir() if not k.startswith('_')]
