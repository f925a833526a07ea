#!/usr/bin/env python
"""Training CLI (zero-arg, like the reference's train.py)."""
from music_generator_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
