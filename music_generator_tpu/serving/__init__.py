from music_generator_tpu.serving.server import GenerationService, serve_main

__all__ = ["GenerationService", "serve_main"]
