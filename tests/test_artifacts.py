"""Integrity of the committed sample artifacts: every .mid under
artifacts/ must parse with the framework's own SMF reader and decode to a
plausible piano roll — guarding the published evidence (the archives/v1
analogue) against codec regressions and corrupt commits."""

import glob
import os

import numpy as np

from music_generator_tpu.midi.codec import midi_decode
from music_generator_tpu.midi.io import read_midifile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_sample_artifacts_parse_and_decode():
    files = sorted(glob.glob(os.path.join(REPO, "artifacts", "**", "*.mid"),
                             recursive=True))
    assert len(files) >= 9, files      # long + short + convergence samples
    for f in files:
        pattern = read_midifile(f)
        assert len(pattern) >= 1, f
        roll = midi_decode(pattern, 128)
        assert roll.ndim == 3 and roll.shape[1:] == (128, 3), (f, roll.shape)
        assert roll.shape[0] > 0, f
        assert (roll >= 0).all() and (roll <= 1).all(), f
        assert roll[..., 0].sum() > 0, f"{f}: no notes"
