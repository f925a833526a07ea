#!/usr/bin/env python
"""Corpus statistics CLI (note/length distributions, autocorrelation)."""
from music_generator_tpu.cli import analyze_main

if __name__ == "__main__":
    analyze_main()
