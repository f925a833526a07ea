"""Dataset pipeline tests: window/target alignment vs. a transliteration-free
oracle of the reference math (ref: dataset.py:28-37), clamp/unclamp, genre
vectors, end-to-end load_all over a synthetic corpus."""

import io
import os

import numpy as np
import pytest

from music_generator_tpu import midi
from music_generator_tpu.config import default_config
from music_generator_tpu.data import (
    batches,
    clamp_midi,
    compute_beat,
    compute_genre,
    load_all,
    stagger,
    transpose_augment,
    unclamp_midi,
)

CFG = default_config()


def test_stagger_matches_reference_math():
    """X windows start every NOTES_PER_BAR after a time_steps zero prefix;
    Y is X shifted one step (ref: dataset.py:28-37)."""
    L, T, hop = 40, 8, 4
    data = np.arange(L, dtype=np.float32).reshape(L, 1) + 1  # 1..L
    x, y = stagger(data, T, hop)

    # Oracle: the reference's loop, written directly from its spec.
    padded = [np.zeros((1,), np.float32)] * T + [data[i] for i in range(L)]
    expected_x, expected_y = [], []
    for i in range(0, len(padded) - T, hop):
        expected_x.append(padded[i:i + T])
        expected_y.append(padded[i + 1:i + T + 1])
    np.testing.assert_array_equal(x, np.array(expected_x))
    np.testing.assert_array_equal(y, np.array(expected_y))
    assert len(x) == int(np.ceil(L / hop))


def test_stagger_first_window_is_zero_prefixed():
    T, hop = 8, 4
    data = np.ones((20, 3), np.float32)
    x, y = stagger(data, T, hop)
    np.testing.assert_array_equal(x[0], np.zeros((T, 3)))
    # Y of the first window sees the first real frame at its end.
    np.testing.assert_array_equal(y[0][-1], data[0])


def test_clamp_unclamp():
    seq = np.random.default_rng(0).random((10, 128, 3))
    clamped = clamp_midi(seq)
    assert clamped.shape == (10, CFG.num_notes, 3)
    np.testing.assert_array_equal(clamped, seq[:, 36:84, :])
    restored = unclamp_midi(clamped)
    assert restored.shape == (10, 84, 3)
    np.testing.assert_array_equal(restored[:, 36:84], clamped)
    assert restored[:, :36].sum() == 0


def test_compute_beat_cycles():
    npb = CFG.notes_per_bar
    for i in range(40):
        b = compute_beat(i, npb)
        assert b.sum() == 1 and b[i % npb] == 1


def test_compute_genre():
    # 3 baroque styles get 1/3 each (ref: dataset.py:20-26).
    g = compute_genre(0)
    assert g.shape == (23,)
    np.testing.assert_allclose(g[:3], 1 / 3)
    assert g[3:].sum() == 0
    g2 = compute_genre(2)
    np.testing.assert_allclose(g2[9:], 1 / 14)
    assert g2[:9].sum() == 0
    assert np.isclose(g2.sum(), 1.0)


def test_transpose_augment():
    seq = np.zeros((4, 48, 3))
    seq[:, 10, 0] = 1
    up = transpose_augment(seq, 2)
    assert up[:, 12, 0].all() and up[:, 10, 0].sum() == 0
    down = transpose_augment(seq, -3)
    assert down[:, 7, 0].all()
    np.testing.assert_array_equal(transpose_augment(seq, 0), seq)


def _write_test_corpus(root, num_files=2, bars=10):
    """Write tiny synthetic .mid files into a style-dir layout."""
    cfg = default_config()
    styledir = os.path.join(root, "data", "baroque", "bach")
    os.makedirs(styledir, exist_ok=True)
    rng = np.random.default_rng(7)
    T = bars * cfg.notes_per_bar
    for i in range(num_files):
        play = np.zeros((T, 128))
        vol = np.zeros((T, 128))
        for _ in range(30):
            p = int(rng.integers(40, 80))
            on = int(rng.integers(0, T - 8))
            dur = int(rng.integers(1, 8))
            play[on:on + dur, p] = 1
            vol[on:on + dur, p] = round(float(rng.uniform(0.4, 1)) * 127) / 127
        roll = np.stack([play, np.zeros((T, 128)), vol], 2)
        pattern = midi.midi_encode(roll, step=1)
        midi.write_midifile(os.path.join(styledir, f"piece{i}.mid"), pattern)
    return [[styledir]]


def test_load_all_end_to_end(tmp_path):
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    styles = _write_test_corpus(str(tmp_path))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = load_all(styles, time_steps=32, config=cfg)
    finally:
        os.chdir(cwd)

    n = len(ds)
    assert n > 0
    assert ds.notes.shape[1:] == (32, 48, 3)
    assert ds.targets.shape[1:] == (32, 48, 3)
    assert ds.beats.shape[1:] == (32, 16)
    assert ds.styles.shape[1:] == (32, 23)
    # Target is input shifted one step within each source sequence.
    np.testing.assert_array_equal(ds.notes[0][1:], ds.targets[0][:-1])
    # Style rows are the bach one-hot — except the zero prefix of early
    # windows (the reference staggers style rows too, ref: dataset.py:70).
    assert (ds.styles[2][:, 0] == 1).all()
    assert ds.styles[0][0].sum() == 0
    # Beat one-hots cycle with period 16; first window is zero-prefixed.
    assert ds.beats[0].sum() == 0
    assert (ds.beats[2].sum(axis=1) == 1).all()


def test_load_all_skips_short_sequences(tmp_path):
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    styles = _write_test_corpus(str(tmp_path), num_files=1, bars=2)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = load_all(styles, time_steps=4096, config=cfg)
    finally:
        os.chdir(cwd)
    assert len(ds) == 0


def test_batches_fixed_shape():
    rng = np.random.default_rng(0)
    from music_generator_tpu.data.dataset import Dataset
    n = 10
    ds = Dataset(
        np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1) * np.ones((n, 2, 3, 3), np.float32)[:, :1, :1, :1],
        np.zeros((n, 1, 1, 3), np.float32),
        np.zeros((n, 1, 4), np.float32),
        np.zeros((n, 1, 5), np.float32))
    got = list(batches(ds, 4, rng=rng))
    assert len(got) == 2  # drop remainder
    got = list(batches(ds, 4, rng=np.random.default_rng(0), drop_remainder=False))
    assert len(got) == 3
    for b in got:
        assert b[0].shape[0] == 4


def test_dataset_shard():
    from music_generator_tpu.data.dataset import Dataset
    n = 8
    ds = Dataset(np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1),
                 np.zeros((n, 1, 1, 1), np.float32),
                 np.zeros((n, 1, 1), np.float32),
                 np.zeros((n, 1, 1), np.float32))
    s0, s1 = ds.shard(0, 2), ds.shard(1, 2)
    assert len(s0) == len(s1) == 4
    np.testing.assert_array_equal(s0.notes.ravel(), [0, 2, 4, 6])
    np.testing.assert_array_equal(s1.notes.ravel(), [1, 3, 5, 7])


def test_dataset_shard_uneven_pads_to_equal_length():
    """Uneven shards must wrap-pad to the SAME length: every train step is a
    global collective, so a host with fewer local rows would run fewer steps
    per epoch and deadlock the cluster."""
    from music_generator_tpu.data.dataset import Dataset

    def make(n):
        return Dataset(np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1),
                       np.zeros((n, 1, 1, 1), np.float32),
                       np.zeros((n, 1, 1), np.float32),
                       np.zeros((n, 1, 1), np.float32))

    # 17 rows over 2 hosts: both get ceil(17/2) = 9.
    ds = make(17)
    s0, s1 = ds.shard(0, 2), ds.shard(1, 2)
    assert len(s0) == len(s1) == 9
    np.testing.assert_array_equal(s0.notes.ravel(),
                                  [0, 2, 4, 6, 8, 10, 12, 14, 16])
    # Host 1 wraps: its 9th row duplicates an existing global row.
    np.testing.assert_array_equal(s1.notes.ravel()[:8],
                                  [1, 3, 5, 7, 9, 11, 13, 15])
    assert s1.notes.ravel()[8] in ds.notes.ravel()

    # Fewer rows than hosts: every host still gets one row.
    tiny = make(2)
    shards = [tiny.shard(i, 4) for i in range(4)]
    assert all(len(s) == 1 for s in shards)
    for s in shards:
        assert s.notes.ravel()[0] in tiny.notes.ravel()

    # Empty stays empty.
    assert len(make(0).shard(0, 2)) == 0


def test_load_all_skips_corrupt_files(tmp_path):
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    styles = _write_test_corpus(str(tmp_path), num_files=1, bars=10)
    # Drop a garbage .mid next to the good one.
    with open(os.path.join(styles[0][0], "corrupt.mid"), "wb") as f:
        f.write(b"not a midi file at all")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = load_all(styles, time_steps=32, config=cfg)
    finally:
        os.chdir(cwd)
    assert len(ds) > 0   # the good file still loads


def test_decode_prime_shared_guards(tmp_path):
    """decode_prime is the single implementation behind the CLI's --prime
    and serving's prime_midi (review r4: the two had diverged).  Guards:
    parse errors → ValueError, prime_bars truncates with a floor at 0
    (negative raises instead of slicing from the END), over-long primes
    rejected."""
    from music_generator_tpu.data.dataset import decode_prime

    roll = np.zeros((2 * CFG.notes_per_bar, CFG.midi_max_notes, 3))
    roll[::4, 60, 0] = 1.0
    roll[::4, 60, 2] = 0.5
    path = str(tmp_path / "p.mid")
    midi.write_midifile(path, midi.midi_encode(roll, step=1))

    full = decode_prime(path, config=CFG)
    assert full.shape[1:] == (CFG.num_notes, 3)
    one_bar = decode_prime(path, prime_bars=1, config=CFG)
    assert one_bar.shape[0] == CFG.notes_per_bar
    np.testing.assert_array_equal(one_bar, full[:CFG.notes_per_bar])

    with pytest.raises(ValueError, match="prime_bars"):
        decode_prime(path, prime_bars=-1, config=CFG)
    with pytest.raises(ValueError, match="too long"):
        decode_prime(path, max_bars=1, config=CFG)

    bad = str(tmp_path / "bad.mid")
    with open(bad, "wb") as f:
        f.write(b"not a midi file")
    with pytest.raises(ValueError, match="not a valid MIDI"):
        decode_prime(bad, config=CFG)
