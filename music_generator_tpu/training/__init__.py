from music_generator_tpu.training.checkpoint import (
    CheckpointStore,
    build_or_load,
)
from music_generator_tpu.training.trainer import Trainer, TrainConfig

__all__ = ["CheckpointStore", "build_or_load", "Trainer", "TrainConfig"]
