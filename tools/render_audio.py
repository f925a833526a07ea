#!/usr/bin/env python
"""Render .mid samples to audible .wav — the audio analogue of the
reference's published MP3s (ref: archives/v1/short_samples/*.mp3,
long_samples/*.mp3), which this image cannot produce for lack of any
synthesizer.  This is a deterministic physically-flavored additive
synthesizer built on the framework's own codec (decode → piano-roll →
waveform), not a piano-sample renderer.  The r5 model carries the four
signatures that make a synthetic tone read as "piano" instead of
"electric piano" (VERDICT r4 #8):

  * stretched partials — f_h = h·f0·sqrt(1 + B·h²) string inharmonicity,
    register-dependent B;
  * unison detune — 2-3 slightly detuned strings per note, so partials
    beat the way a real unison does;
  * dual-stage decay — a fast hammer transient into a slow singing
    sustain, faster in the treble, with per-partial extra damping (high
    partials die first) and velocity-dependent brightness;
  * a hammer-noise attack and a soundboard/sympathetic-resonance tail
    (an exponentially-decaying noise impulse response convolved onto the
    dry mix via FFT).

Deterministic: all randomness (partial phases, hammer noise, the
soundboard IR) comes from fixed-seed generators in iteration order, so
rendered .wav bytes are reproducible from the committed .mid artifacts.
Still an honest approximation — not a sampled Steinway — but a reader
can LISTEN to the committed samples without MIDI tooling.

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
MAX_PARTIALS = 14


def _note_signal(np, freq, vel, dur, n, sr, rng):
    """One struck piano note: stretched, beating partials under a
    dual-stage velocity-bright envelope, with a hammer-noise attack."""
    t = np.arange(n) / sr
    # Dual-stage decay: the hammer stage dies in ~1/8 s, the sustain sings
    # on; both faster toward the treble (short strings).
    k_fast = 7.0 + freq / 180.0
    k_slow = 0.55 + freq / 650.0
    env = 0.9 * np.exp(-k_fast * t) + 0.75 * np.exp(-k_slow * t)
    rel = np.ones(n)
    if n > dur:
        rel[dur:] = np.exp(-13.0 * (np.arange(n - dur) / sr))
    # String inharmonicity: partials stretch as sqrt(1 + B h²); B grows
    # toward the treble's short stiff strings.
    B = 1.1e-4 * (freq / 261.63) ** 0.7
    # Velocity brightness: harder strikes excite the upper partials more.
    bright = 0.45 + 0.52 * min(vel, 1.0)
    # Unison detune (Hz): bass/mid notes have 3 strings, treble 2 — the
    # slight detune is what makes a sustained unison beat like a piano.
    detunes = (0.0, 0.22, -0.27) if freq < 1100.0 else (0.0, 0.14)
    sig = np.zeros(n)
    for h in range(1, MAX_PARTIALS + 1):
        f = freq * h * float(np.sqrt(1.0 + B * h * h))
        if f >= 0.47 * sr:
            break
        amp = h ** -1.6 * bright ** (h - 1)
        if amp < 2e-4:
            break
        # High partials damp faster than the fundamental.
        damp = np.exp(-0.55 * (h - 1) * t) if h > 1 else 1.0
        ph = rng.uniform(0.0, 2.0 * np.pi)
        partial = np.zeros(n)
        for d in detunes:
            partial += np.sin(2.0 * np.pi * (f + d * (1.0 + 0.25 * h)) * t
                              + ph)
        sig += (amp / len(detunes)) * partial * damp
    # Hammer contact noise: a few ms of decaying noise, brighter and
    # louder with velocity.
    nh = min(n, int(0.006 * sr))
    noise = rng.standard_normal(nh) * np.exp(-np.arange(nh)
                                             / (0.0012 * sr))
    sig[:nh] += 0.12 * vel * noise
    return sig * env * rel


def render_roll(roll, sr=SAMPLE_RATE):
    """[T, 128, 3] piano roll → float waveform in [-1, 1]."""
    import numpy as np

    T = roll.shape[0]
    step = int(round(STEP_SECONDS * sr))
    tail = int(2.0 * sr)                       # release tail after the end
    total = T * step + tail
    out = np.zeros(total, np.float64)
    rng = np.random.default_rng(12345)         # fixed: bytes reproducible

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
            n = dur + int(1.6 * sr)            # ring past the release
            seg = _note_signal(np, freq, vel, dur, n, sr, rng)
            start = t0 * step
            out[start:start + n] += (0.16 * vel) * seg[:max(0,
                                                            total - start)]

    # Soundboard / sympathetic resonance: convolve the dry mix with a
    # short decaying noise impulse response (smoothed to kill hiss) —
    # the cheap, deterministic stand-in for strings ringing along.
    ir_n = int(0.30 * sr)
    ir_rng = np.random.default_rng(777)
    ir = ir_rng.standard_normal(ir_n) * np.exp(-np.arange(ir_n)
                                               / (0.055 * sr))
    kernel = np.ones(8) / 8.0                  # ~2.8 kHz lowpass-ish
    ir = np.convolve(ir, kernel, mode="same")
    ir[0] = 0.0
    m = total + ir_n
    nfft = 1 << int(np.ceil(np.log2(m)))
    wet = np.fft.irfft(np.fft.rfft(out, nfft) * np.fft.rfft(ir, nfft),
                       nfft)[:total]
    wet_gain = 0.035                           # subtle room, not reverb wash
    out = out + wet_gain * wet

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
