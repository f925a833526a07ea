#!/usr/bin/env python
"""Analyze WHERE and WHY two generated .mid files diverge: decode both to
rolls, find the first differing (timestep, pitch, channel), and — given the
params — replay the prefix through the model on this backend to report how
close the flipped draw's probability was to its uniform (the knife-edge
evidence for docs/FIDELITY.md).

Usage:
  python tools/analyze_divergence.py A.mid B.mid [--params runs/fidelity/params.npz --seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("a")
    parser.add_argument("b")
    parser.add_argument("--params", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--style", default="0",
                        help="style of the analyzed stream: an int "
                             "(one-hot composer) or genre:N (uniform "
                             "genre mixture) — check_fidelity's "
                             "genres_<seed>_<i>.mid files use genre:<i>")
    parser.add_argument("--stream-offset", type=int, default=0,
                        help="the stream's GLOBAL index (deviation #10): "
                             "stream i of a batched run draws "
                             "fold_in(seed, i) uniforms — pass i when "
                             "analyzing file _<seed>_<i> of a batch")
    args = parser.parse_args(argv)

    import numpy as np

    from music_generator_tpu import midi
    from music_generator_tpu.config import default_config

    cfg = default_config()
    ra = midi.midi_decode(midi.read_midifile(args.a), cfg.midi_max_notes)
    rb = midi.midi_decode(midi.read_midifile(args.b), cfg.midi_max_notes)
    T = min(len(ra), len(rb))
    diff = np.argwhere(ra[:T] != rb[:T])
    if len(diff) == 0 and len(ra) == len(rb):
        print("rolls identical")
        return
    if len(diff) == 0:
        print(f"rolls identical over common prefix; lengths {len(ra)} vs "
              f"{len(rb)}")
        return
    t0, pitch, ch = diff[0]
    names = {0: "play", 1: "replay", 2: "volume"}
    print(f"first divergence: t={t0}, midi pitch={pitch}, "
          f"channel={names[int(ch)]}: {ra[t0, pitch, ch]:.6f} vs "
          f"{rb[t0, pitch, ch]:.6f}")
    print(f"total differing cells: {len(diff)} "
          f"({len(diff) / ra[:T].size:.2%} of the roll — a single early "
          f"flip cascades through the autoregression)")

    if args.params is None:
        return

    # Replay the prefix (file A's notes as forced choices) to measure how
    # close the diverging draw sat to its uniform.
    import jax
    import jax.numpy as jnp
    from music_generator_tpu.data.dataset import clamp_midi
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.ops.sampling import apply_temperature
    from music_generator_tpu.utils import one_hot
    from tools.check_fidelity import _params_from_npz

    from music_generator_tpu.data.dataset import compute_genre

    model = DeepJ(cfg.replace(lstm_kernel="xla",
                              compute_dtype=cfg.gen_dtype))
    params = _params_from_npz(model, args.params)
    sampler = Sampler(model, params)
    if args.style.startswith("genre:"):
        style_vec = compute_genre(int(args.style.split(":", 1)[1]), cfg)
    else:
        style_vec = one_hot(int(args.style), cfg.num_styles)
    style = jnp.asarray(np.stack([style_vec]), jnp.float32)
    with jax.default_matmul_precision(cfg.gen_matmul_precision):
        style_emb = model.style_embedding(params, style)

        notes = clamp_midi(ra, cfg)          # [T, 48, 3] — file A's piece
        n_clamped = int(pitch) - cfg.min_note
        state = sampler._init_state(1, jnp.uint32(args.seed), 1.0,
                                    args.stream_offset)
        for t in range(int(t0) + 1):
            beat = (jax.nn.one_hot((t - 1) % cfg.notes_per_bar,
                                   cfg.notes_per_bar) * (t > 0))[None]
            feats, time_state = model.time_axis_step(
                params, state.prev_note, beat, style_emb, state.time_state)
            # Deviation #10 stream-indexed uniforms: fold_in(stream_key, t).
            us = sampler._step_uniforms(state.stream_keys, jnp.int32(t))
            if t == int(t0):
                # Walk the pitch recurrence with A's choices up to the
                # diverging pitch, then report p vs u there.
                note_state = model.init_note_state(1)
                prev = jnp.zeros((1, 3))
                for n in range(n_clamped + 1):
                    pred, note_state = model.note_axis_cell(
                        params, feats[:, n], prev, style_emb, note_state)
                    probs = apply_temperature(
                        pred[:, :2], state.temperature[:, None])
                    if n == n_clamped:
                        if int(ch) == 2:
                            # Volume byte flip: distance of the raw head
                            # output to the decision boundary between the
                            # two observed bytes.  Raw copy-through
                            # decides at the int(vol*127) TRUNCATION
                            # boundary; gen_volume_quantize decides at
                            # the round(vol*127) MIDPOINT — report both
                            # so either mode's analysis is labeled right.
                            v = float(np.clip(float(pred[0, 2]), 0.0, 1.0))
                            ka = int(round(float(ra[t0, pitch, 2]) * 127))
                            kb = int(round(float(rb[t0, pitch, 2]) * 127))
                            trunc = max(ka, kb) / 127
                            mid = (ka + kb) / 2 / 127
                            print(f"at the flip: raw volume head={v:.9f}, "
                                  f"bytes {ka} vs {kb}; distance to "
                                  f"truncation boundary {trunc:.9f}: "
                                  f"{abs(v - trunc):.3e}; to rounding "
                                  f"midpoint {mid:.9f}: {abs(v - mid):.3e} "
                                  f"(ULP-scale drift across backends "
                                  f"lands this byte differently)")
                        else:
                            u = float(us[0, n, int(ch)])
                            p = float(probs[0, int(ch)])
                            print(f"at the flip: "
                                  f"{'play' if ch == 0 else 'replay'} "
                                  f"prob={p:.9f} uniform={u:.9f} "
                                  f"|p-u|={abs(p - u):.3e}")
                        return
                    prev = jnp.asarray(notes[t, n])[None]
            # advance the time axis with A's actual choices, mirroring
            # _step's adaptive-temperature bookkeeping
            row = notes[t]
            silent = row.sum() == 0
            st = int(state.silent_time[0]) + 1 if silent else 0
            if silent and st >= cfg.notes_per_bar:
                temp = float(state.temperature[0]) + 0.1
            elif silent:
                temp = float(state.temperature[0])
            else:
                temp = float(state.base_temp[0])
            state = state._replace(
                time_state=time_state,
                prev_note=jnp.asarray(row)[None],
                temperature=jnp.full((1,), temp),
                silent_time=jnp.full((1,), st, jnp.int32))


if __name__ == "__main__":
    main()
