"""Corpus analysis tests (the working rebuild of the reference's dead
distribution.py — SURVEY.md §2 #17)."""

import json
import os

import numpy as np

from music_generator_tpu import midi
from music_generator_tpu.config import default_config
from music_generator_tpu.data.analysis import (
    analyze_corpus,
    autocorrelation,
    length_distribution,
    note_distribution,
)


def test_note_and_length_distribution():
    r1 = np.zeros((10, 128, 3))
    r1[:, 60, 0] = 1
    r2 = np.zeros((4, 128, 3))
    r2[:2, 72, 0] = 1
    hist = note_distribution([r1, r2])
    assert hist[60] == 10 and hist[72] == 2 and hist.sum() == 12
    np.testing.assert_array_equal(length_distribution([r1, r2]), [10, 4])


def test_autocorrelation_periodic_signal():
    roll = np.zeros((64, 128, 3))
    roll[::4, 50, 0] = 1          # strict period-4 pulse
    ac = autocorrelation(roll, max_lag=8)
    assert ac[3] > 0.9            # lag 4 (index 3)
    assert ac[0] < 0.5


def test_analyze_corpus_end_to_end(tmp_path, monkeypatch):
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    styledir = tmp_path / "data" / "baroque" / "bach"
    styledir.mkdir(parents=True)
    monkeypatch.chdir(tmp_path)

    rng = np.random.default_rng(0)
    T = 64
    play = np.zeros((T, 128))
    play[::4, 60] = 1
    vol = play * 0.5
    pattern = midi.midi_encode(np.stack([play, np.zeros((T, 128)), vol], 2),
                               step=1)
    midi.write_midifile(str(styledir / "a.mid"), pattern)

    stats = analyze_corpus([[str(styledir)]], cfg)
    assert stats["num_files"] == 1
    assert stats["pitch_range_used"] == [60, 60]
    adir = tmp_path / "out" / "analysis"
    assert (adir / "corpus_stats.json").exists()
    assert (adir / "note_distribution.tsv").exists()
    assert (adir / "lengths.tsv").exists()
    assert (adir / "autocorrelation.tsv").exists()
    loaded = json.load(open(adir / "corpus_stats.json"))
    assert loaded["num_files"] == 1


def test_piece_metrics_replay_rate():
    """replay_rate = re-articulation events per sounding cell: the replay
    head's footprint in the music (a model whose replay head never fires
    scores exactly 0 — as DeepJ v1's published pieces nearly do:
    1 re-strike in 7,631 onsets, docs/TRAINING.md)."""
    from music_generator_tpu.data.analysis import piece_metrics

    roll = np.zeros((8, 128, 3))
    roll[:, 60, 0] = 1.0            # 8 sounding cells
    roll[4, 60, 1] = 1.0            # one re-strike mid-note
    roll[:, 60, 2] = 0.5
    m = piece_metrics(roll)
    assert m["notes"] == 8
    assert m["replay_rate"] == 1.0 / 8
    assert piece_metrics(np.zeros((4, 128, 3)))["replay_rate"] == 0.0


def test_event_replays_recovers_encoder_written_re_strikes():
    """midi_encode writes re-articulations as same-instant off+on pairs on
    the frame grid, where midi_decode's pinned quirk suppresses them — so
    the decoded replay channel of an encoder round-trip reads 0 and
    event_replays is the only way to see them (render_audio and the replay
    evidence in docs/TRAINING.md rely on this)."""
    from music_generator_tpu.data.analysis import event_replays

    roll = np.zeros((8, 2, 3))
    roll[:, 0, 0] = 1.0               # pitch 0 held throughout
    roll[:, 0, 2] = 0.5
    roll[4, 0, 1] = 1.0               # ...with a re-strike at t=4
    roll[4:, 1, 0] = 1.0              # pitch 1 onsets at t=4 so the row's
    roll[4:, 1, 2] = 0.5              # play vector changes (the encoder
    # drops replays on unchanged rows — test_codec pins that quirk)
    pattern = midi.midi_encode(roll, step=1)
    decoded = midi.midi_decode(pattern, classes=2, step=1)
    assert decoded[..., 1].sum() == 0          # the quirk erases it
    assert event_replays(pattern, step=1) == [(4, 0)]   # this recovers it


def test_event_replays_requires_a_sounding_note():
    """A defensive NoteOff on a SILENT pitch followed by its NoteOn at the
    same instant (a common sequencer export pattern) is a plain onset, not
    a re-strike — event_replays mirrors the decoder's vol_prev > 0
    condition, so the renderer's union can't corrupt such files."""
    import pytest

    from music_generator_tpu.data.analysis import event_replays
    from music_generator_tpu.midi.events import (
        EndOfTrackEvent,
        NoteOffEvent,
        NoteOnEvent,
    )
    from music_generator_tpu.midi.io import Pattern, Track

    defensive = Track([NoteOffEvent(tick=0, pitch=60, velocity=0),
                       NoteOnEvent(tick=0, pitch=60, velocity=80),
                       EndOfTrackEvent(tick=4)])
    assert event_replays(Pattern([defensive], resolution=4)) == []

    genuine = Track([NoteOnEvent(tick=0, pitch=60, velocity=80),
                     NoteOffEvent(tick=4, pitch=60, velocity=0),
                     NoteOnEvent(tick=0, pitch=60, velocity=80),
                     EndOfTrackEvent(tick=4)])
    assert event_replays(Pattern([genuine], resolution=4)) == [(4, 60)]

    # Same boundary contract as midi_decode: a sub-beat resolution is
    # rejected, not silently scanned on a grid no decodable roll uses.
    with pytest.raises(ValueError, match="unsupported MIDI resolution"):
        event_replays(Pattern([genuine], resolution=2))
