"""Binary Standard-MIDI-File IO tests: serialization round-trips, running
status, varlen encoding, and the full roll→file→roll loop."""

import io

import numpy as np

from music_generator_tpu import midi
from music_generator_tpu.midi.io import _read_varlen, _write_varlen


def test_varlen_roundtrip():
    for v in [0, 1, 127, 128, 129, 8191, 8192, 16383, 16384, 2097151, 2097152]:
        encoded = _write_varlen(v)
        assert _read_varlen(io.BytesIO(encoded)) == v
    assert _write_varlen(0) == b"\x00"
    assert _write_varlen(127) == b"\x7f"
    assert _write_varlen(128) == b"\x81\x00"


def _simple_pattern():
    track = midi.Track([
        midi.SetTempoEvent(tick=0, mpqn=500_000),
        midi.TimeSignatureEvent(tick=0, numerator=4, denominator=4),
        midi.NoteOnEvent(tick=0, velocity=100, pitch=60),
        midi.NoteOnEvent(tick=48, velocity=90, pitch=64),
        midi.NoteOffEvent(tick=48, pitch=60),
        midi.NoteOffEvent(tick=0, pitch=64),
        midi.EndOfTrackEvent(tick=10),
    ])
    return midi.Pattern([track], resolution=96)


def test_write_read_roundtrip():
    pattern = _simple_pattern()
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    buf.seek(0)
    back = midi.read_midifile(buf)

    assert back.resolution == 96
    assert len(back) == 1
    assert list(back[0]) == list(pattern[0])


def test_write_is_deterministic():
    pattern = _simple_pattern()
    a, b = io.BytesIO(), io.BytesIO()
    midi.write_midifile(a, pattern)
    midi.write_midifile(b, pattern)
    assert a.getvalue() == b.getvalue()


def test_running_status_parse():
    """Hand-built track bytes using running status must parse correctly."""
    track_bytes = bytes([
        0x00, 0x90, 60, 100,   # NoteOn ch0 pitch 60
        0x10, 62, 90,          # running status: NoteOn pitch 62
        0x20, 0x80, 60, 0,     # NoteOff
        0x00, 62, 0,           # running status NoteOff
        0x00, 0xFF, 0x2F, 0x00,
    ])
    data = (b"MThd" + (6).to_bytes(4, "big")
            + (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(track_bytes).to_bytes(4, "big") + track_bytes)
    pattern = midi.read_midifile(io.BytesIO(data))
    events = pattern[0]
    assert isinstance(events[0], midi.NoteOnEvent) and events[0].pitch == 60
    assert isinstance(events[1], midi.NoteOnEvent) and events[1].pitch == 62
    assert events[1].tick == 0x10
    assert isinstance(events[2], midi.NoteOffEvent) and events[2].pitch == 60
    assert isinstance(events[3], midi.NoteOffEvent) and events[3].pitch == 62
    assert isinstance(events[4], midi.EndOfTrackEvent)


def test_unknown_events_preserved():
    """Control-change / program-change / pitch-bend / generic meta events
    survive a write→read round trip (real corpora contain them)."""
    from music_generator_tpu.midi.events import (
        ControlChangeEvent, MetaEvent, PitchWheelEvent, ProgramChangeEvent)
    track = midi.Track([
        MetaEvent(tick=0, meta_type=0x03, payload=b"track name"),
        ProgramChangeEvent(tick=0, value=0),
        ControlChangeEvent(tick=5, control=64, value=127),
        PitchWheelEvent(tick=2, pitch_bend=0x1234),
        midi.NoteOnEvent(tick=0, velocity=80, pitch=40),
        midi.EndOfTrackEvent(tick=0),
    ])
    pattern = midi.Pattern([track], resolution=480)
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    buf.seek(0)
    back = midi.read_midifile(buf)
    assert list(back[0]) == list(track)
    assert back[0][3].pitch_bend == 0x1234


def test_full_roll_file_roll_loop():
    """roll → encode → write → read → decode reproduces the play channel
    (the BASELINE byte-identity pipeline, ref: midi_util.py:212-217)."""
    rng = np.random.default_rng(0)
    T, P = 32, 8
    play = np.zeros((T, P))
    volume = np.zeros((T, P))
    # Random notes; volume constant per hold (the encoder samples volume only
    # at onsets, so mid-hold volume changes are lossy by design —
    # ref: midi_util.py:41-45).
    for p in range(P):
        on = int(rng.integers(0, T - 4))
        dur = int(rng.integers(1, 4))
        play[on:on + dur, p] = 1
        # Quantize to the exact velocity grid so decode round-trips exactly.
        volume[on:on + dur, p] = round(float(rng.uniform(0.3, 1.0)) * 127) / 127
    replay = np.zeros((T, P))
    roll = np.stack([play, replay, volume], axis=2)

    pattern = midi.midi_encode(roll, step=1)
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    buf.seek(0)
    back = midi.read_midifile(buf)
    decoded = midi.midi_decode(back, P, step=1)

    np.testing.assert_array_equal(decoded[:T, :, 0], play)
    np.testing.assert_array_almost_equal(decoded[:T, :, 2], volume, decimal=6)


def test_write_read_bytes_stable():
    """write(read(write(p))) is byte-identical to write(p)."""
    pattern = _simple_pattern()
    a = io.BytesIO()
    midi.write_midifile(a, pattern)
    a.seek(0)
    b = io.BytesIO()
    midi.write_midifile(b, midi.read_midifile(a))
    assert a.getvalue() == b.getvalue()


def test_empty_track_decodes_to_single_frame():
    """A track with only EndOfTrack produces the tail frame only."""
    pattern = midi.Pattern([midi.Track([midi.EndOfTrackEvent(tick=0)])],
                           resolution=96)
    roll = midi.midi_decode(pattern, 8, step=24)
    assert roll.shape == (1, 8, 3)
    assert roll.sum() == 0


def test_zero_length_file_raises():
    import pytest
    with pytest.raises(Exception):
        midi.read_midifile(io.BytesIO(b""))


def test_truncated_file_raises():
    import pytest
    pattern = midi.Pattern([midi.Track([
        midi.NoteOnEvent(tick=0, velocity=80, pitch=40),
        midi.EndOfTrackEvent(tick=4)])], resolution=96)
    buf = io.BytesIO()
    midi.write_midifile(buf, pattern)
    data = buf.getvalue()[:20]   # cut mid-header/track
    with pytest.raises(Exception):
        p = midi.read_midifile(io.BytesIO(data))
        # Header-only truncation may parse as zero tracks; that's fine too.
        if len(p) == 0:
            raise ValueError("no tracks")


def test_truncated_meta_and_sysex_payloads_raise():
    """Meta/sysex events whose declared length exceeds the remaining track
    bytes must raise like truncated channel events do, not parse with a
    silently shortened payload (review r4: a crafted upload could smuggle
    e.g. a 0-byte SetTempo through the hardened parse boundary)."""
    import pytest

    def track_bytes(body: bytes) -> bytes:
        return (b"MThd" + (6).to_bytes(4, "big") + (1).to_bytes(2, "big")
                + (1).to_bytes(2, "big") + (96).to_bytes(2, "big")
                + b"MTrk" + len(body).to_bytes(4, "big") + body)

    # delta 0, meta 0x51 (SetTempo) declaring 3 payload bytes, none present.
    bad_meta = track_bytes(bytes([0x00, 0xFF, 0x51, 0x03]))
    with pytest.raises(EOFError, match="meta"):
        midi.read_midifile(io.BytesIO(bad_meta))
    # delta 0, sysex 0xF0 declaring 4 payload bytes, one present.
    bad_sysex = track_bytes(bytes([0x00, 0xF0, 0x04, 0x7E]))
    with pytest.raises(EOFError, match="sysex"):
        midi.read_midifile(io.BytesIO(bad_sysex))


def test_notes_above_clamp_range_survive_decode():
    """Full-range decode keeps pitches outside [36, 84); clamping is the
    dataset's job (ref: dataset.py:78-82), not the codec's."""
    pattern = midi.Pattern([midi.Track([
        midi.NoteOnEvent(tick=0, velocity=90, pitch=100),
        midi.NoteOffEvent(tick=4, pitch=100),
        midi.EndOfTrackEvent(tick=0)])], resolution=4)
    roll = midi.midi_decode(pattern, 128, step=1)
    assert roll[:4, 100, 0].all()


def _valid_file_bytes():
    roll = np.zeros((32, 128, 3), np.float32)
    roll[::4, 60, 0] = 1.0
    roll[::4, 60, 2] = 0.7
    roll[2::8, 64, 0] = 1.0
    roll[2::8, 64, 2] = 0.5
    buf = io.BytesIO()
    midi.write_midifile(buf, midi.midi_encode(roll, step=1))
    return buf.getvalue()


def test_parser_survives_all_truncations():
    """Serving accepts user MIDI uploads (prime_midi): every prefix
    truncation of a valid file must either parse or raise a clean
    exception — never hang, never return garbage that crashes later
    stages differently than a ValueError would."""
    data = _valid_file_bytes()
    ok = (ValueError, EOFError, KeyError, IndexError)
    import struct as _struct
    for cut in range(len(data)):
        try:
            p = midi.read_midifile(io.BytesIO(data[:cut]))
        except ok:
            continue
        except _struct.error:
            continue
        # Parsed: downstream decode must also be safe.
        midi.midi_decode(p, 128, step=1)


def test_parser_survives_random_mutations():
    """500 deterministic single-byte corruptions of a valid file: parse +
    decode either succeed or raise cleanly (the serving handler converts
    any of these to HTTP 400 via resolve_prime's Exception wrap)."""
    data = bytearray(_valid_file_bytes())
    rng = np.random.RandomState(0)
    ok = (ValueError, EOFError, KeyError, IndexError, OverflowError)
    import struct as _struct
    for _ in range(500):
        pos = int(rng.randint(len(data)))
        old = data[pos]
        data[pos] = int(rng.randint(256))
        try:
            p = midi.read_midifile(io.BytesIO(bytes(data)))
            midi.midi_decode(p, 128, step=1)
            # The serving path derives step from the (possibly corrupted)
            # resolution — a sub-notes_per_beat value must raise the
            # boundary ValueError, not a bare ZeroDivisionError.
            midi.midi_decode(p, 128)
        except ok:
            pass
        except _struct.error:
            pass
        finally:
            data[pos] = old


def test_decode_rejects_sub_beat_resolution():
    import pytest
    pattern = midi.Pattern([midi.Track([
        midi.NoteOnEvent(tick=0, velocity=90, pitch=60),
        midi.EndOfTrackEvent(tick=4)])], resolution=2)
    with pytest.raises(ValueError, match="resolution"):
        midi.midi_decode(pattern, 128)


def test_writer_preserves_format_field():
    """The header format field is pattern.fmt as given (python-midi writes
    Pattern.format, default 1; the reference's published files are all
    format 1 single-track).  The writer once forced format 0 for
    single-track patterns, breaking read-write losslessness — pin both
    directions."""
    import struct

    from music_generator_tpu.midi.events import (
        EndOfTrackEvent,
        NoteOnEvent,
    )
    from music_generator_tpu.midi.io import (
        Pattern,
        Track,
        read_midifile,
        write_midifile,
    )
    track = Track([NoteOnEvent(tick=0, pitch=60, velocity=64),
                   EndOfTrackEvent(tick=4)])
    for fmt in (0, 1):
        buf = io.BytesIO()
        write_midifile(buf, Pattern([track], resolution=4, fmt=fmt))
        data = buf.getvalue()
        assert struct.unpack(">H", data[8:10])[0] == fmt
        again = io.BytesIO()
        write_midifile(again, read_midifile(io.BytesIO(data)))
        assert again.getvalue() == data          # lossless round-trip
