"""Codec golden tests, ported from the reference's unit suite
(ref: test.py:1-195) — same fixtures, same expected matrices/event streams —
plus extra coverage of quirks the reference leaves untested."""

import numpy as np
import pytest

from music_generator_tpu import midi
from music_generator_tpu.config import default_config

CFG = default_config()


def test_encode():
    # ref: test.py:7-53
    composition = [
        [0, 1, 0, 0],
        [0, 1, 0, 0],
        [0, 1, 0, 1],
        [0, 1, 0, 1],
        [0, 0, 0, 1],
        [0, 0, 0, 0],
    ]
    replay = np.zeros((6, 4))
    volume = [
        [0, 0.5, 0, 0],
        [0, 0.5, 0, 0],
        [0, 0.5, 0, 0.5],
        [0, 0.5, 0, 0.5],
        [0, 0, 0, 0.5],
        [0, 0, 0, 0],
    ]

    pattern = midi.midi_encode(np.stack([composition, replay, volume], 2), step=1)
    assert pattern.resolution == CFG.notes_per_beat
    assert len(pattern) == 1
    track = pattern[0]
    assert len(track) == 4 + 1
    on1, on2, off1, off2 = track[:-1]
    assert isinstance(on1, midi.NoteOnEvent)
    assert isinstance(on2, midi.NoteOnEvent)
    assert isinstance(off1, midi.NoteOffEvent)
    assert isinstance(off2, midi.NoteOffEvent)

    assert on1.tick == 0
    assert on1.pitch == 1
    assert on2.tick == 2
    assert on2.pitch == 3
    assert off1.tick == 2
    assert off1.pitch == 1
    assert off2.tick == 1
    assert off2.pitch == 3


def test_decode():
    # ref: test.py:55-77
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)

    track.append(midi.NoteOnEvent(tick=0, velocity=127, pitch=0))
    track.append(midi.NoteOnEvent(tick=96, velocity=127, pitch=1))
    track.append(midi.NoteOffEvent(tick=0, velocity=127, pitch=0))
    track.append(midi.NoteOffEvent(tick=48, velocity=127, pitch=1))
    track.append(midi.EndOfTrackEvent(tick=1))

    note_sequence = midi.midi_decode(pattern, 4, step=CFG.default_res // 2)
    composition = note_sequence[:, :, 0]

    np.testing.assert_array_equal(composition, [
        [1, 0, 0, 0],
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 0, 0],
    ])


def test_encode_decode():
    # ref: test.py:79-108
    composition = [
        [0, 1, 0, 0],
        [0, 1, 0, 0],
        [0, 1, 0, 1],
        [0, 1, 0, 1],
        [0, 0, 0, 1],
        [0, 0, 0, 0],
    ]
    replay = np.zeros((6, 4))
    volume = [
        [0, 0.5, 0, 0],
        [0, 0.5, 0, 0],
        [0, 0.5, 0, 0.5],
        [0, 0.5, 0, 0.5],
        [0, 0, 0, 0.5],
        [0, 0, 0, 0],
    ]

    note_seq = midi.midi_decode(
        midi.midi_encode(np.stack([composition, replay, volume], 2), step=1),
        4, step=1)
    np.testing.assert_array_equal(composition, note_seq[:, :, 0])


def test_replay_decode():
    # ref: test.py:110-131
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)

    track.append(midi.NoteOnEvent(tick=0, velocity=127, pitch=1))
    track.append(midi.NoteOnEvent(tick=0, velocity=127, pitch=3))
    track.append(midi.NoteOffEvent(tick=1, velocity=127, pitch=1))
    track.append(midi.NoteOnEvent(tick=2, velocity=127, pitch=1))
    track.append(midi.NoteOnEvent(tick=2, velocity=127, pitch=3))
    track.append(midi.EndOfTrackEvent(tick=1))

    note_seq = midi.midi_decode(pattern, 4, step=3)

    np.testing.assert_array_equal(note_seq[:, :, 1], [
        [0., 0., 0., 0.],
        [0., 0., 0., 1.],
        [0., 0., 0., 0.],
    ])


def test_volume_decode():
    # ref: test.py:134-155
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)

    track.append(midi.NoteOnEvent(tick=0, velocity=24, pitch=0))
    track.append(midi.NoteOnEvent(tick=96, velocity=89, pitch=1))
    track.append(midi.NoteOffEvent(tick=0, pitch=0))
    track.append(midi.NoteOffEvent(tick=48, pitch=1))
    track.append(midi.EndOfTrackEvent(tick=1))

    note_seq = midi.midi_decode(pattern, 4, step=CFG.default_res // 2)

    np.testing.assert_array_almost_equal(note_seq[:, :, 2], [
        [24 / 127, 0., 0., 0.],
        [24 / 127, 0., 0., 0.],
        [0., 89 / 127, 0., 0.],
        [0., 0., 0., 0.],
    ], decimal=5)


def test_replay_encode_decode():
    # ref: test.py:158-193 (the replay-channel assertion is disabled there
    # too: downsampling is lossy for replay by design).
    composition = [
        [0, 1, 0, 1],
        [0, 0, 0, 1],
        [0, 0, 0, 1],
        [0, 1, 0, 1],
        [0, 1, 0, 1],
        [0, 1, 0, 1],
        [0, 0, 0, 0],
    ]
    replay = [
        [0, 0, 0, 0],
        [0, 0, 0, 0],
        [0, 0, 0, 0],
        [0, 0, 0, 0],
        [0, 0, 0, 1],
        [0, 1, 0, 1],
        [0, 0, 0, 0],
    ]
    volume = [
        [0, 0.5, 0, 0.5],
        [0, 0, 0, 0.5],
        [0, 0, 0, 0.5],
        [0, 0.5, 0, 0.5],
        [0, 0.5, 0, 0.5],
        [0, 0.5, 0, 0.5],
        [0, 0, 0, 0],
    ]

    note_seq = midi.midi_decode(
        midi.midi_encode(np.stack([composition, replay, volume], 2), step=2),
        4, step=2)
    np.testing.assert_array_equal(composition, note_seq[:, :, 0])


# ---------------------------------------------------------------------------
# Additional coverage beyond the reference suite
# ---------------------------------------------------------------------------

def test_noteon_velocity_zero_is_off():
    """NoteOn with velocity 0 releases the note (ref: midi_util.py:143-145
    relies on velocity/127 == 0)."""
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)
    track.append(midi.NoteOnEvent(tick=0, velocity=100, pitch=2))
    track.append(midi.NoteOnEvent(tick=96, velocity=0, pitch=2))
    track.append(midi.EndOfTrackEvent(tick=96))

    note_seq = midi.midi_decode(pattern, 4, step=96)
    np.testing.assert_array_equal(note_seq[:, :, 0], [
        [0, 0, 1, 0],
        [0, 0, 0, 0],
        [0, 0, 0, 0],
    ])


def test_multitrack_merge_additive_clamp():
    """Two tracks playing the same pitch sum volumes and clamp to 1
    (ref: midi_util.py:182-190)."""
    pattern = midi.Pattern(resolution=4)
    for _ in range(2):
        track = midi.Track()
        track.append(midi.NoteOnEvent(tick=0, velocity=89, pitch=0))
        track.append(midi.NoteOffEvent(tick=2, pitch=0))
        track.append(midi.EndOfTrackEvent(tick=0))
        pattern.append(track)

    note_seq = midi.midi_decode(pattern, 4, step=1)
    assert note_seq[0, 0, 0] == 1.0           # play clamped
    assert note_seq[0, 0, 2] == 1.0           # 2 * 89/127 > 1 → clamped
    assert note_seq[2, 0, 2] == 0.0


def test_multitrack_different_lengths_pad():
    """Shorter track zero-pads to the longer (ref: midi_util.py:170-186)."""
    pattern = midi.Pattern(resolution=4)
    t1 = midi.Track([
        midi.NoteOnEvent(tick=0, velocity=127, pitch=0),
        midi.NoteOffEvent(tick=8, pitch=0),
        midi.EndOfTrackEvent(tick=0),
    ])
    t2 = midi.Track([
        midi.NoteOnEvent(tick=0, velocity=127, pitch=1),
        midi.NoteOffEvent(tick=2, pitch=1),
        midi.EndOfTrackEvent(tick=0),
    ])
    pattern.extend([t1, t2])
    note_seq = midi.midi_decode(pattern, 4, step=1)
    assert note_seq.shape[0] == 9
    np.testing.assert_array_equal(note_seq[:, 0, 0], [1] * 8 + [0])
    np.testing.assert_array_equal(note_seq[:, 1, 0], [1, 1] + [0] * 7)


def test_replay_skipped_at_frame_boundary():
    """A re-articulation landing exactly on a frame boundary is NOT flagged
    as replay — the reference's downsample buffer was just reset
    (ref: midi_util.py:136-137 leaves len(volume_buffer)==1 at boundary
    ticks, so the check at :148 is skipped)."""
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)
    track.append(midi.NoteOnEvent(tick=0, velocity=127, pitch=0))
    track.append(midi.NoteOnEvent(tick=3, velocity=127, pitch=0))  # boundary
    track.append(midi.EndOfTrackEvent(tick=3))

    note_seq = midi.midi_decode(pattern, 4, step=3)
    assert note_seq[:, 0, 1].sum() == 0


def test_final_frame_volume_is_window_start():
    """The tail frame's volume is the state at its first tick, not the
    window max (ref: midi_util.py:157-160)."""
    pattern = midi.Pattern(resolution=96)
    track = midi.Track()
    pattern.append(track)
    # Note turns on at tick 4, inside the tail window [3, 5].
    track.append(midi.NoteOnEvent(tick=4, velocity=127, pitch=0))
    track.append(midi.EndOfTrackEvent(tick=1))

    note_seq = midi.midi_decode(pattern, 4, step=3)
    # Frames: [0,3) → off; tail frame starts at tick 3 where the note is
    # still off → volume 0 even though it turns on at tick 4.
    np.testing.assert_array_equal(note_seq[:, 0, 2], [0, 0])


def test_encode_replay_emits_off_on_pair():
    """Replay while held emits NoteOff + NoteOn(tick=0)
    (ref: midi_util.py:57-70)."""
    composition = np.array([[1.0], [1.0], [0.0]])
    replay = np.array([[0.0], [1.0], [0.0]])
    volume = np.array([[0.5], [0.7], [0.0]])
    roll = np.stack([composition, replay, volume], axis=2)
    # A replay alone doesn't change the play row, so the row-equality gate
    # (ref: midi_util.py:35) swallows it; pair it with another pitch change.
    roll2 = np.zeros((3, 2, 3))
    roll2[:, 0] = roll[:, 0]
    roll2[1, 1] = [1, 0, 0.9]   # second pitch turns on at t=1 → row changes
    roll2[2, 1] = [0, 0, 0]

    pattern = midi.midi_encode(roll2, step=1)
    track = pattern[0]
    kinds = [type(e).__name__ for e in track]
    assert kinds == [
        "NoteOnEvent",             # pitch 0 on @0
        "NoteOffEvent",            # pitch 0 replay off @1
        "NoteOnEvent",             # pitch 0 replay on @1 (tick 0)
        "NoteOnEvent",             # pitch 1 on @1
        "NoteOffEvent",            # pitch 0 off @2
        "NoteOffEvent",            # pitch 1 off @2
        "EndOfTrackEvent",
    ]
    assert track[1].tick == 1 and track[2].tick == 0
    assert track[2].velocity == int(0.7 * 127)


def test_encode_replay_without_row_change_is_dropped():
    """Replay with an unchanged play row emits nothing
    (ref: midi_util.py:35, and the commented-out `or np.any(replay[tick])`)."""
    composition = np.array([[1.0], [1.0], [1.0]])
    replay = np.array([[0.0], [1.0], [0.0]])
    volume = np.array([[0.5], [0.5], [0.5]])
    pattern = midi.midi_encode(np.stack([composition, replay, volume], 2), step=1)
    track = pattern[0]
    kinds = [type(e).__name__ for e in track]
    assert kinds == ["NoteOnEvent", "NoteOffEvent", "EndOfTrackEvent"]


def test_encode_zero_volume_note_on_quirk():
    """A play=1 / volume=0 cell emits NoteOn with velocity 0 — which MIDI
    (and this decoder: play = ceil(0) = 0) treats as note-off, so the note
    vanishes on re-decode.  Inherited from the reference's unconditional
    velocity = volume*127 (ref: midi_util.py:41-45); pinned so nobody
    "fixes" the encoder into byte divergence (codec.py module doc)."""
    roll = np.zeros((2, 1, 3))
    roll[0, 0] = [1.0, 0.0, 0.0]          # played, volume exactly 0
    pattern = midi.midi_encode(roll, step=1)
    track = pattern[0]
    assert type(track[0]).__name__ == "NoteOnEvent"
    assert track[0].velocity == 0
    decoded = midi.midi_decode(pattern, classes=1, step=1)
    assert decoded[..., 0].sum() == 0     # silently absent on re-decode


def test_encode_trailing_silence_eot_tick():
    """EndOfTrack carries the trailing no-op row count, unscaled by step
    (ref: midi_util.py:73,92)."""
    roll = np.zeros((6, 2, 3))
    roll[0, 0] = [1, 0, 0.5]
    roll[1, 0] = [0, 0, 0]
    pattern = midi.midi_encode(roll, step=4)
    track = pattern[0]
    assert isinstance(track[-1], midi.EndOfTrackEvent)
    # Rows 2..5 are unchanged → 4 no-op ticks.
    assert track[-1].tick == 4
    # The off event at row 1 is scaled by step.
    assert track[1].tick == 4
