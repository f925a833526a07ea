from music_generator_tpu.generation.sampler import (
    GenerationResult,
    Sampler,
    write_file,
)

__all__ = ["Sampler", "GenerationResult", "write_file"]
