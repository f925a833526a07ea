#!/usr/bin/env python
"""Generation CLI: --bars, --styles (same flags as the reference)."""
from music_generator_tpu.cli import generate_main

if __name__ == "__main__":
    generate_main()
