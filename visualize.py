#!/usr/bin/env python
"""Style-embedding TSV export for projector.tensorflow.org."""
from music_generator_tpu.cli import visualize_main

if __name__ == "__main__":
    visualize_main()
