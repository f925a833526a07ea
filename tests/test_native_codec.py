"""Differential tests: the native C++ decoder must be bit-identical to the
Python codec on generated corpora, including every quirk (boundary replay
suppression, tail-frame snapshot volume, additive multi-track merge)."""

import io
import os
import subprocess

import numpy as np
import pytest

from music_generator_tpu import midi
from music_generator_tpu.midi import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native.available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)
        native._LIB_TRIED = False      # re-probe after build
    assert native.available()


def _roundtrip_bytes(pattern):
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    return buf.getvalue()


def _random_pattern(seed, tracks=1, events_per_track=60, resolution=96):
    rng = np.random.default_rng(seed)
    pattern = midi.Pattern(resolution=resolution)
    for _ in range(tracks):
        track = midi.Track()
        sounding = set()
        for _ in range(events_per_track):
            tick = int(rng.integers(0, 40))
            pitch = int(rng.integers(20, 100))
            kind = rng.random()
            if kind < 0.55 or not sounding:
                track.append(midi.NoteOnEvent(
                    tick=tick, pitch=pitch,
                    velocity=int(rng.integers(1, 128))))
                sounding.add(pitch)
            elif kind < 0.9:
                p = int(rng.choice(sorted(sounding)))
                track.append(midi.NoteOffEvent(tick=tick, pitch=p))
                sounding.discard(p)
            else:
                # NoteOn velocity 0 == off
                p = int(rng.choice(sorted(sounding)))
                track.append(midi.NoteOnEvent(tick=tick, pitch=p, velocity=0))
                sounding.discard(p)
        track.append(midi.EndOfTrackEvent(tick=int(rng.integers(0, 30))))
        pattern.append(track)
    return pattern


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_random_single_track(seed):
    pattern = _random_pattern(seed)
    data = _roundtrip_bytes(pattern)
    py = midi.midi_decode(midi.read_midifile(io.BytesIO(data)), 128)
    nat = native.native_decode_bytes(data)
    assert py.shape == nat.shape
    np.testing.assert_array_equal(py, nat)


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_native_matches_python_multitrack(seed):
    pattern = _random_pattern(seed, tracks=3, events_per_track=40)
    data = _roundtrip_bytes(pattern)
    py = midi.midi_decode(midi.read_midifile(io.BytesIO(data)), 128)
    nat = native.native_decode_bytes(data)
    np.testing.assert_array_equal(py, nat)


def test_native_replay_semantics():
    """Re-articulations at boundary and inner ticks."""
    pattern = midi.Pattern(resolution=8)   # step = 8/4 = 2
    track = midi.Track([
        midi.NoteOnEvent(tick=0, pitch=60, velocity=100),
        midi.NoteOnEvent(tick=3, pitch=60, velocity=90),   # inner → replay
        midi.NoteOnEvent(tick=1, pitch=60, velocity=80),   # boundary tick 4
        midi.NoteOffEvent(tick=5, pitch=60),
        midi.EndOfTrackEvent(tick=2),
    ])
    pattern.append(track)
    data = _roundtrip_bytes(pattern)
    py = midi.midi_decode(midi.read_midifile(io.BytesIO(data)), 128)
    nat = native.native_decode_bytes(data)
    np.testing.assert_array_equal(py, nat)
    # Sanity: inner replay detected, boundary one suppressed.
    assert py[:, 60, 1].sum() == 1


def test_native_file_roundtrip(tmp_path):
    pattern = _random_pattern(7, tracks=2)
    path = str(tmp_path / "x.mid")
    midi.write_midifile(path, pattern)
    py = midi.midi_decode(midi.read_midifile(path), 128)
    nat = native.native_decode_file(path)
    np.testing.assert_array_equal(py, nat)


def test_native_truncated_track_chunk_rejected():
    """An MTrk length field that exceeds the remaining file must fail cleanly
    (parse error → RuntimeError), never read past the buffer (round-1
    advisor finding: OOB heap read / segfault on truncated files)."""
    data = bytearray(_roundtrip_bytes(_random_pattern(3)))
    i = data.find(b"MTrk")
    assert i > 0
    data[i + 4:i + 8] = (0x7FFFFFF0).to_bytes(4, "big")  # absurd length
    with pytest.raises(RuntimeError):
        native.native_decode_bytes(bytes(data))
    # A file truncated mid-track is the same failure, not a crash.
    with pytest.raises(RuntimeError):
        native.native_decode_bytes(bytes(data[:i + 12]))


def test_load_midi_uses_native_and_caches(tmp_path, monkeypatch):
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    monkeypatch.chdir(tmp_path)
    pattern = _random_pattern(9)
    midi.write_midifile("y.mid", pattern)
    roll = load_midi("y.mid", cfg)
    assert roll.shape[1:] == (128, 3)
    assert os.path.exists(os.path.join(cfg.cache_dir, "y.mid.npy"))
    # Cache hit path returns identical data.
    roll2 = load_midi("y.mid", cfg)
    np.testing.assert_array_equal(roll, roll2)


def test_load_midi_absolute_path_caches_under_cache_dir(tmp_path, monkeypatch):
    """An absolute corpus path must cache UNDER cache_dir, not write a
    stray .npy next to the source (review r4: the reference-style bare
    join resolves absolute fnames to the corpus directory itself)."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    monkeypatch.chdir(tmp_path)
    src = str(corpus / "a.mid")
    midi.write_midifile(src, _random_pattern(3))
    roll = load_midi(src, cfg)
    assert roll.shape[1:] == (128, 3)
    assert list(corpus.iterdir()) == [corpus / "a.mid"]   # no stray .npy
    cached = os.path.join(cfg.cache_dir, "__abs__",
                          src.lstrip(os.sep) + ".npy")
    assert os.path.exists(cached)
    np.testing.assert_array_equal(roll, load_midi(src, cfg))  # hit path


def test_load_midi_cache_keys_do_not_alias_traversal_paths(tmp_path,
                                                           monkeypatch):
    """'../sub/x.mid' and 'sub/x.mid' are DIFFERENT files.  Dropping the
    leading '..' from the cache key aliased them onto one entry, so the
    freshly-written cache of one could be served as the other's roll
    (review r4: the mtime guard sees a newer cache and hits)."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    work = tmp_path / "work"
    (tmp_path / "sub").mkdir()
    (work / "sub").mkdir(parents=True)
    cfg = default_config().replace(out_dir=str(work / "out"))
    monkeypatch.chdir(work)
    midi.write_midifile(str(tmp_path / "sub" / "x.mid"), _random_pattern(3))
    midi.write_midifile("sub/x.mid", _random_pattern(7))
    roll_up = load_midi(os.path.join("..", "sub", "x.mid"), cfg)
    roll_rel = load_midi(os.path.join("sub", "x.mid"), cfg)
    expected_rel = midi.midi_decode(midi.read_midifile("sub/x.mid"), 128)
    np.testing.assert_array_equal(roll_rel, expected_rel)
    expected_up = midi.midi_decode(
        midi.read_midifile(str(tmp_path / "sub" / "x.mid")), 128)
    np.testing.assert_array_equal(roll_up, expected_up)
    assert roll_up.shape != roll_rel.shape or (roll_up != roll_rel).any()


def test_load_midi_survives_unwritable_cache(tmp_path, monkeypatch):
    """A failed cache write must not discard a successful decode (review
    r4: the caller treats the exception as an unreadable MIDI and silently
    drops the file from the corpus)."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    blocked = tmp_path / "out"
    blocked.mkdir(mode=0o500)              # read+execute only
    cfg = default_config().replace(out_dir=str(blocked))
    monkeypatch.chdir(tmp_path)
    midi.write_midifile("w.mid", _random_pattern(5))
    try:
        roll = load_midi("w.mid", cfg)
    finally:
        blocked.chmod(0o700)
    expected = midi.midi_decode(midi.read_midifile("w.mid"), 128)
    np.testing.assert_array_equal(roll, expected)


def test_load_midi_invalidates_stale_cache(tmp_path, monkeypatch):
    """Rewriting the source .mid must invalidate its .npy cache (deliberate
    improvement over the reference, which serves stale decodes forever)."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    cfg = default_config().replace(out_dir=str(tmp_path / "out"))
    monkeypatch.chdir(tmp_path)
    midi.write_midifile("z.mid", _random_pattern(1))
    roll1 = load_midi("z.mid", cfg)
    # Replace the source with a different piece — possibly within the SAME
    # filesystem-timestamp tick as the cache write (the `<=` staleness rule
    # covers the tie; no utime fudging needed).
    midi.write_midifile("z.mid", _random_pattern(2))
    roll2 = load_midi("z.mid", cfg)
    expected = midi.midi_decode(midi.read_midifile("z.mid"), 128)
    np.testing.assert_array_equal(roll2, expected)
    assert roll1.shape != roll2.shape or not np.array_equal(roll1, roll2)


@pytest.mark.parametrize("seed", range(4))
def test_native_decoder_survives_garbage(seed):
    """Adversarial robustness: random byte soup and bit-flipped valid files
    must either parse or raise cleanly — never crash the process (the
    native decoder is the default corpus-loading path)."""
    rng = np.random.default_rng(1000 + seed)
    # Pure garbage (wrong magic) fails fast.
    for n in (0, 3, 14, 200):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            native.native_decode_bytes(blob)
        except RuntimeError:
            pass
    # Valid file with random mutations: every outcome must be a clean
    # return or a RuntimeError.
    base = bytearray(_roundtrip_bytes(_random_pattern(seed)))
    for _ in range(40):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        try:
            roll = native.native_decode_bytes(bytes(data))
            assert roll.ndim == 3
        except RuntimeError:
            pass


def test_native_rejects_sub_beat_resolution_like_python():
    """A resolution below notes_per_beat (derived step would be 0) fails
    LOUDLY on both decoders — the Python codec's boundary ValueError and
    the native decoder's parse error — instead of the native path
    silently decoding at a clamped step=1 grid the Python path would
    never produce (r4 parity fix)."""
    pattern = midi.Pattern([midi.Track([
        midi.NoteOnEvent(tick=0, velocity=90, pitch=60),
        midi.EndOfTrackEvent(tick=4)])], resolution=2)
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    with pytest.raises(ValueError, match="resolution"):
        midi.midi_decode(midi.read_midifile(io.BytesIO(buf.getvalue())), 128)
    with pytest.raises(RuntimeError):
        native.native_decode_bytes(buf.getvalue())


def test_load_midi_relative_traversal_caches_under_cache_dir(tmp_path,
                                                             monkeypatch):
    """A relative path with '..' segments must also cache UNDER cache_dir
    ('../data/x.mid' would otherwise resolve the key outside it — the
    same littering failure deviation #11 closed for absolute paths)."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import load_midi
    (tmp_path / "data").mkdir()
    (tmp_path / "sub").mkdir()
    src_abs = tmp_path / "data" / "x.mid"
    midi.write_midifile(str(src_abs), _random_pattern(3))
    monkeypatch.chdir(tmp_path / "sub")
    cfg = default_config()          # out/cache relative to sub/
    roll = load_midi(os.path.join("..", "data", "x.mid"), cfg)
    assert roll.shape[1:] == (128, 3)
    cached = os.path.join(cfg.cache_dir, "__up__", "data", "x.mid.npy")
    assert os.path.exists(cached)
    # Nothing escaped: the only .npy under tmp_path lives in sub/out/cache.
    strays = [p for p in tmp_path.rglob("*.npy")
              if (tmp_path / "sub" / "out") not in p.parents]
    assert strays == []


def _smf(track_body: bytes, division: int = 96) -> bytes:
    import struct
    head = b"MThd" + struct.pack(">IHHH", 6, 1, 1, division)
    return head + b"MTrk" + struct.pack(">I", len(track_body)) + track_body


def test_system_common_status_rejected_by_both_parsers():
    """0xF1-0xFE are not valid SMF track content: the Python parser raises
    and the native parser must too — the pre-fix native fell into the
    channel-event branch (consuming two bytes, adopting 0xFn as running
    status), so corpus contents depended on whether the .so was built."""
    body = bytes([0x00, 0xF1, 0x00, 0x00, 0x00, 0xFF, 0x2F, 0x00])
    data = _smf(body)
    with pytest.raises(ValueError, match="invalid status byte"):
        midi.read_midifile(io.BytesIO(data))
    if native.available():
        with pytest.raises(RuntimeError):
            native.native_decode_bytes(data)


def test_overlong_varint_rejected_by_both_parsers():
    """SMF bounds a varint at 4 bytes; a 5-byte encoding must fail the
    parse identically on both sides (the pre-fix native silently truncated
    and resumed misaligned; Python read on unboundedly)."""
    body = (bytes([0x81, 0x80, 0x80, 0x80, 0x00])      # 5-byte varint delta
            + bytes([0x90, 60, 64, 0x00, 0xFF, 0x2F, 0x00]))
    data = _smf(body)
    with pytest.raises(ValueError, match="4-byte bound"):
        midi.read_midifile(io.BytesIO(data))
    if native.available():
        with pytest.raises(RuntimeError):
            native.native_decode_bytes(data)


def test_bad_bytes_before_end_of_track_rejected_by_both_parsers():
    """An EndOfTrack must not launder a failed read that precedes it: the
    pre-fix native returned success from the 0x2F branch without checking
    Reader.ok, so an overlong varint DELTA on the EndOfTrack event itself
    (or a meta payload running past EOF) produced a roll where the Python
    parser raises — parser-dependent corpus contents (review r4)."""
    body = (bytes([0x00, 0x90, 60, 64])                # NoteOn at t=0
            + bytes([0x81, 0x80, 0x80, 0x80, 0x00])    # 5-byte varint delta
            + bytes([0xFF, 0x2F, 0x00]))               # ...on the EoT
    data = _smf(body)
    with pytest.raises(ValueError, match="4-byte bound"):
        midi.read_midifile(io.BytesIO(data))
    if native.available():
        with pytest.raises(RuntimeError):
            native.native_decode_bytes(data)
    # Meta length past EOF on the EndOfTrack: same laundering hole.
    body2 = bytes([0x00, 0x90, 60, 64, 0x00, 0xFF, 0x2F, 0x7F])
    data2 = _smf(body2)
    with pytest.raises(Exception):
        midi.read_midifile(io.BytesIO(data2))
    if native.available():
        with pytest.raises(RuntimeError):
            native.native_decode_bytes(data2)


def test_frame_bound_rejected_by_both_decoders():
    """A (well-formed) delta of 0x0FFFFFFF ticks implies ~11M frames at
    this division — over the 2^20 bound both decoders enforce, so the file
    fails cleanly per-file instead of driving a multi-GB allocation (the
    pre-fix native could abort the whole process via std::bad_alloc
    unwinding through ctypes)."""
    body = (bytes([0x00, 0x90, 60, 64])                # NoteOn at t=0
            + bytes([0xFF, 0xFF, 0xFF, 0x7F])          # max 4-byte varint
            + bytes([0x80, 60, 0, 0x00, 0xFF, 0x2F, 0x00]))
    data = _smf(body)
    pattern = midi.read_midifile(io.BytesIO(data))     # parse itself is fine
    with pytest.raises(ValueError, match="2\\^20"):
        midi.midi_decode(pattern, 128)
    if native.available():
        with pytest.raises(RuntimeError):
            native.native_decode_bytes(data)
