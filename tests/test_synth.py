"""Synthetic corpus generator tests: determinism, musical structure
(replay channel exercised, style separability), and that the written corpus
round-trips the codec into load_all()."""

import os

import numpy as np

from music_generator_tpu.config import test_config as make_test_config
from music_generator_tpu.data.dataset import load_all
from music_generator_tpu.data.synth import (
    pitch_class_histogram,
    synth_piece,
    write_synth_corpus,
)

CFG = make_test_config()


def test_synth_piece_deterministic():
    a = synth_piece(0, bars=4, seed=3, config=CFG)
    b = synth_piece(0, bars=4, seed=3, config=CFG)
    np.testing.assert_array_equal(a, b)
    c = synth_piece(0, bars=4, seed=4, config=CFG)
    assert not np.array_equal(a, c)


def test_synth_piece_shape_and_channels():
    roll = synth_piece(1, bars=4, seed=0, config=CFG)
    assert roll.shape == (4 * CFG.notes_per_bar, CFG.midi_max_notes, 3)
    play, replay, vol = roll[..., 0], roll[..., 1], roll[..., 2]
    assert set(np.unique(play)) <= {0.0, 1.0}
    assert replay.sum() > 0, "re-articulations must exercise the replay bit"
    assert (replay <= play).all()
    assert ((vol > 0) == (play > 0)).all()
    assert vol.max() <= 1.0
    # Pitches stay in the modeled range.
    outside = np.concatenate([play[:, :CFG.min_note],
                              play[:, CFG.max_note:]], axis=1)
    assert outside.sum() == 0


def test_styles_are_separable():
    """Same style, different seeds → near-identical pitch-class profile;
    different styles → far apart (what lets the echo test score fidelity)."""
    h0a = pitch_class_histogram(synth_piece(0, bars=16, seed=0, config=CFG))
    h0b = pitch_class_histogram(synth_piece(0, bars=16, seed=9, config=CFG))
    h5 = pitch_class_histogram(synth_piece(5, bars=16, seed=0, config=CFG))
    assert np.minimum(h0a, h0b).sum() > 0.85
    assert np.minimum(h0a, h5).sum() < 0.5


def test_written_corpus_round_trips_exactly_including_replay(tmp_path):
    """The written corpus must decode back to the source roll EXACTLY on all
    three channels.  Replay is the load-bearing one: midi_encode's
    same-instant off+on replay pair lands on the frame grid, where the
    decoder's pinned quirk suppresses replay — so a corpus written that way
    trained the replay head on all-zero targets (review r4 finding).  The
    replay-preserving writer places re-strikes one tick inside the frame,
    like real corpora do."""
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile

    cfg = CFG
    paths = write_synth_corpus(str(tmp_path), styles=[0], files_per_style=1,
                               bars=4, config=cfg)
    src = synth_piece(0, bars=4, seed=0, config=cfg)
    assert src[..., 1].sum() > 0, "source must contain re-articulations"
    dec = midi_decode(read_midifile(paths[0]), cfg.midi_max_notes, config=cfg)
    T = src.shape[0]
    np.testing.assert_array_equal(dec[:T], src)
    assert dec[T:].sum() == 0          # decoder tail frame only


def test_corpus_loads_through_pipeline(tmp_path, monkeypatch):
    cfg = CFG.replace(bars_per_seq=2, out_dir=str(tmp_path / "out"))
    paths = write_synth_corpus(str(tmp_path), styles=[0, 1],
                               files_per_style=1, bars=4, config=cfg)
    assert all(os.path.exists(p) for p in paths)
    monkeypatch.chdir(tmp_path)
    ds = load_all(config=cfg)
    assert len(ds) > 0
    assert ds.notes.shape[1:] == (cfg.seq_len, cfg.num_notes, 3)
    # Style one-hots point at the right directories.
    assert set(np.argmax(ds.styles[:, 0], axis=-1)) == {0, 1}


def test_shifted_corpus_matches_training_transform(tmp_path, monkeypatch):
    """write_synth_corpus(shift=k) must equal applying the TRAINING
    augmentation transform (transpose_augment on the clamped view) to the
    shift=0 corpus — the eval corpora of the augmentation study use the
    exact transform the training pipeline uses (advisor r2: shifting the
    pre-clamp roll let clamp-boundary notes survive)."""
    from music_generator_tpu.data.dataset import clamp_midi, transpose_augment
    from music_generator_tpu.midi.codec import load_midi

    cfg = CFG.replace(out_dir=str(tmp_path / "out"))
    base = tmp_path / "base"
    shifted = tmp_path / "shifted"
    k = 2
    p0 = write_synth_corpus(str(base), styles=[0], files_per_style=1,
                            bars=4, config=cfg)
    p2 = write_synth_corpus(str(shifted), styles=[0], files_per_style=1,
                            bars=4, shift=k, config=cfg)
    monkeypatch.chdir(tmp_path)
    r0 = clamp_midi(load_midi(os.path.relpath(p0[0]), cfg), cfg)
    r2 = clamp_midi(load_midi(os.path.relpath(p2[0]), cfg), cfg)
    np.testing.assert_array_equal(transpose_augment(r0, k), r2)


def test_random_batch_is_deterministic_and_shaped():
    """random_batch feeds the driver-facing bench/dryrun parity checks —
    its draws must be a stable function of (cfg, seed)."""
    import numpy as np

    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.synth import random_batch

    cfg = test_config(batch_size=3)
    a = random_batch(cfg)
    b = random_batch(cfg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    notes, targets, beats, styles = a
    assert notes.shape == (3, cfg.seq_len, cfg.num_notes, 3)
    assert beats.shape == (3, cfg.seq_len, cfg.notes_per_bar)
    assert styles.shape == (3, cfg.seq_len, cfg.num_styles)
    # Independent-target mode differs from the notes; rolled mode shifts.
    assert not np.array_equal(targets, notes)
    rolled = random_batch(cfg, rolled_targets=True)
    np.testing.assert_array_equal(rolled[1], np.roll(rolled[0], -1, axis=1))
    # And the two modes share the identical notes draw.
    np.testing.assert_array_equal(rolled[0], notes)
