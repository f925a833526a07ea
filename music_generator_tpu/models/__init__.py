from music_generator_tpu.models.deepj import (
    DeepJ,
    init_params,
    primary_loss,
)

__all__ = ["DeepJ", "init_params", "primary_loss"]
