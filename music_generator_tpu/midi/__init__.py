"""Self-contained MIDI subsystem: event model, binary Standard-MIDI-File IO,
and the piano-roll codec (play/replay/volume channels).

Replaces the reference's dependency on the `vishnubob/python-midi` package
(ref: README.md:10-13) plus ref: midi_util.py.  The event model intentionally
exposes the same surface the reference code relied on (NoteOnEvent with
`.tick`/`.pitch`/`.velocity`/`.data`, list-like Pattern/Track) so the codec
tests can be stated the same way, but the parser/writer and the codec are
written from scratch.
"""

from music_generator_tpu.midi.events import (
    EndOfTrackEvent,
    Event,
    MetaEvent,
    NoteOffEvent,
    NoteOnEvent,
    Pattern,
    SetTempoEvent,
    SysexEvent,
    TimeSignatureEvent,
    Track,
)
from music_generator_tpu.midi.io import read_midifile, write_midifile
from music_generator_tpu.midi.codec import (
    load_midi,
    midi_decode,
    midi_encode,
)

__all__ = [
    "Event",
    "NoteOnEvent",
    "NoteOffEvent",
    "EndOfTrackEvent",
    "MetaEvent",
    "SetTempoEvent",
    "TimeSignatureEvent",
    "SysexEvent",
    "Pattern",
    "Track",
    "read_midifile",
    "write_midifile",
    "midi_decode",
    "midi_encode",
    "load_midi",
]
