from music_generator_tpu.data.dataset import (
    Dataset,
    batches,
    clamp_midi,
    compute_beat,
    compute_genre,
    load_all,
    stagger,
    transpose_augment,
    unclamp_midi,
)

__all__ = [
    "Dataset",
    "batches",
    "clamp_midi",
    "compute_beat",
    "compute_genre",
    "load_all",
    "stagger",
    "transpose_augment",
    "unclamp_midi",
]
