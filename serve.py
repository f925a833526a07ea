#!/usr/bin/env python
"""Generation HTTP server (POST /generate → .mid bytes)."""
from music_generator_tpu.serving import serve_main

if __name__ == "__main__":
    serve_main()
