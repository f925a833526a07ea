from music_generator_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from music_generator_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
