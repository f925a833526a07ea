#!/usr/bin/env python
"""Render .mid samples to audible .wav — the audio analogue of the
reference's published MP3s (ref: archives/v1/short_samples/*.mp3,
long_samples/*.mp3), which this image cannot produce for lack of any
synthesizer.  This is a small deterministic additive synthesizer built
on the framework's own codec (decode → piano-roll → waveform), not a
piano-sample renderer: harmonics with exponential decay, velocity
scaling, replay re-articulation.  Honest caveat: it sounds like a soft
electric piano, not DeepJ's MP3 renders — its purpose is that a reader
can LISTEN to the committed samples without MIDI tooling.

Deterministic (pure numpy, no RNG), so rendered .wav bytes are
reproducible from the committed .mid artifacts.

Usage:
  python tools/render_audio.py artifacts/long_samples_r3/long_0.mid [...]
  python tools/render_audio.py --all-artifacts   # render the committed sets
"""

import argparse
import glob
import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE_RATE = 22050
# 16th-note step duration at the codec's fixed grid; the reference's
# encoder writes resolution=NOTES_PER_BEAT with no tempo event, so
# players assume 120 bpm -> one beat = 0.5 s, one 16th = 0.125 s.
STEP_SECONDS = 0.125
HARMONICS = ((1, 1.00), (2, 0.45), (3, 0.22), (4, 0.10), (5, 0.05))


def render_roll(roll, sr=SAMPLE_RATE):
    """[T, 128, 3] piano roll → float waveform in [-1, 1]."""
    import numpy as np

    T = roll.shape[0]
    step = int(round(STEP_SECONDS * sr))
    tail = int(1.2 * sr)                       # release tail after the end
    total = T * step + tail
    out = np.zeros(total, np.float64)

    play, replay, volume = roll[..., 0], roll[..., 1], roll[..., 2]
    for pitch in range(128):
        p_col = play[:, pitch]
        if not p_col.any():
            continue
        # Note onsets: 0→1 play transitions plus replay re-articulations
        # while held (the codec's NoteOff+NoteOn pair semantics).
        prev = np.concatenate([[0.0], p_col[:-1]])
        onsets = np.flatnonzero(((p_col > 0) & (prev == 0))
                                | ((replay[:, pitch] > 0) & (p_col > 0)))
        if not len(onsets):
            continue
        freq = 440.0 * 2.0 ** ((pitch - 69) / 12.0)
        for i, t0 in enumerate(onsets):
            # Note ends at release (play→0) or the next re-articulation.
            t_end = t0 + 1
            while t_end < T and p_col[t_end] > 0 and \
                    not (replay[t_end, pitch] > 0):
                t_end += 1
            vel = float(volume[t0, pitch])
            if vel <= 0:
                continue
            dur = (t_end - t0) * step
            n = dur + int(0.9 * sr)            # ring past the release
            t = np.arange(n) / sr
            env = np.exp(-2.2 * t)             # pluck-style decay
            # release: fade quickly once the key is up
            rel = np.ones(n)
            rel[dur:] = np.exp(-12.0 * (np.arange(n - dur) / sr))
            sig = np.zeros(n)
            for h, amp in HARMONICS:
                f = freq * h
                if f >= sr / 2:
                    break
                sig += amp * np.sin(2 * np.pi * f * t)
            start = t0 * step
            seg = sig * env * rel * (0.18 * vel)
            out[start:start + n] += seg[:max(0, total - start)]

    peak = np.abs(out).max()
    if peak > 0.98:
        out *= 0.98 / peak
    return out


def write_wav(path, signal, sr=SAMPLE_RATE):
    import numpy as np
    pcm = np.clip(signal * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def render_file(mid_path, wav_path=None):
    """Decode + synthesize one .mid.  Re-strikes the decode suppresses
    (generated files carry them as frame-grid off+on pairs, where the
    decoder's pinned quirk drops them) are recovered at the event level
    via `analysis.event_replays` and unioned into the replay channel;
    for real corpora the decode already detects them and the union is
    idempotent."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.analysis import event_replays
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile

    cfg = default_config()
    pattern = read_midifile(mid_path)
    roll = midi_decode(pattern, cfg.midi_max_notes, config=cfg)
    for frame, pitch in event_replays(pattern, config=cfg):
        if frame < len(roll) and roll[frame, pitch, 0] > 0:
            roll[frame, pitch, 1] = 1.0
    wav_path = wav_path or os.path.splitext(mid_path)[0] + ".wav"
    write_wav(wav_path, render_roll(roll))
    print("rendered", wav_path)
    return wav_path


ARTIFACT_SETS = (
    "artifacts/long_samples_r3/*.mid",
    "artifacts/long_samples_r4/*.mid",
    "artifacts/short_samples_r2/*.mid",
    "artifacts/short_samples_r4/*.mid",
    "artifacts/real_corpus_r3/*.mid",
    "artifacts/primed_demos_r4/*.mid",
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("paths", nargs="*")
    parser.add_argument("--all-artifacts", action="store_true",
                        help="render every committed sample set next to "
                             "its .mid")
    args = parser.parse_args(argv)
    paths = list(args.paths)
    if args.all_artifacts:
        for pat in ARTIFACT_SETS:
            paths.extend(sorted(glob.glob(os.path.join(REPO, pat))))
    if not paths:
        parser.error("give .mid paths or --all-artifacts")
    for p in paths:
        render_file(p)


if __name__ == "__main__":
    main()
