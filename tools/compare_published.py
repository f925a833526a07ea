#!/usr/bin/env python
"""Quantitative comparison of this framework's generations against the
reference's PUBLISHED music (ref: archives/v1/long_samples/ — the nine
.mid pieces DeepJ's authors shipped as the model's showcase output, three
per genre).

The style-fidelity evidence elsewhere (docs/TRAINING.md) scores
generations against synth corpora or the training pieces; this tool uses
the real yardstick: the model trained on the published pieces themselves
(artifacts/real_corpus_r3/params.npz, tools/run_real_corpus.py) generates
per-genre music that is compared to the published pieces on the
quality fingerprint of data/analysis.piece_metrics — note density,
polyphony, velocity distribution, 12-dim pitch-class profile
(histogram-intersection vs the genre's published profile, with
cross-genre intersections as the control), and bar-period
autocorrelation.

Writes artifacts/published_compare_r4/report.json + REPORT.md.
Deterministic (fixed seeds, backend-stable sampling discipline), so the
committed report regenerates exactly; runs on CPU or TPU.

Run from /root/repo:  python tools/compare_published.py
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/archives/v1/long_samples"
GENRE_NAMES = ["Baroque", "Classical", "Romantic"]
# The real-corpus training staged each genre under its first composer slot
# (tools/run_real_corpus.py::stage_real_corpus): flat style ids 0/3/9.
GENRE_STYLE_IDS = [0, 3, 9]
SEEDS = (0, 1, 2)
BARS = 32
TEMPERATURE = 0.75     # the regime the committed real-corpus samples use


def _mean(dicts, path):
    vals = []
    for d in dicts:
        v = d
        for k in path:
            v = v[k]
        vals.append(v)
    import numpy as np
    return float(np.mean(vals))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "published_compare_r4"))
    parser.add_argument("--params", default=os.path.join(
        REPO, "artifacts", "real_corpus_r3", "params.npz"))
    parser.add_argument("--temperature", type=float, default=TEMPERATURE,
                        help="sampling temperature for the scored "
                             "generations (default 0.75, the committed "
                             "real-corpus sample regime; the reference's "
                             "stock generate.py runs T=1 — "
                             "ref: generate.py:17)")
    args = parser.parse_args(argv)
    temperature = args.temperature

    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.analysis import (
        event_replays,
        piece_metrics,
        profile_intersection,
    )
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.utils import one_hot
    from tools.check_fidelity import _params_from_npz

    cfg = default_config()

    # --- the published yardstick -----------------------------------------
    published = {}
    for genre in GENRE_NAMES:
        files = sorted(glob.glob(os.path.join(REF_DIR, f"{genre} *.mid")))
        assert len(files) == 3, files
        published[genre] = []
        for f in files:
            pattern = read_midifile(f)
            roll = midi_decode(pattern, cfg.midi_max_notes, config=cfg)
            # The published files ship at resolution 4 → step 1, the grid
            # where the decoder's pinned reference quirk suppresses ALL
            # replay detection — so the decoded replay channel is zero by
            # construction, not by musical content.  Recover re-strikes
            # at the event level (the same union render_audio.py applies)
            # so the published replay_rate column measures the music, not
            # the quirk.  (Measured: exactly 1 re-strike across all nine
            # pieces — docs/TRAINING.md's zero-replay finding survives.)
            for frame, pitch in event_replays(pattern, config=cfg):
                if frame < len(roll) and roll[frame, pitch, 0] > 0:
                    roll[frame, pitch, 1] = 1.0
            m = piece_metrics(roll)
            m["file"] = os.path.basename(f)
            published[genre].append(m)

    # --- the rebuild's generations ---------------------------------------
    model = DeepJ(cfg)
    params = _params_from_npz(model, args.params)
    sampler = Sampler(model, params)
    generated = {}
    for genre, sid in zip(GENRE_NAMES, GENRE_STYLE_IDS):
        generated[genre] = []
    for seed in SEEDS:
        res = sampler.generate(
            [one_hot(s, cfg.num_styles) for s in GENRE_STYLE_IDS],
            num_bars=BARS, seed=seed, temperature=temperature)
        for gi, genre in enumerate(GENRE_NAMES):
            # Compare on the same 128-pitch footing as the decoded
            # published rolls (pitch classes align: min_note 36 ≡ C).
            roll = np.zeros((res.notes.shape[1], cfg.midi_max_notes, 3))
            roll[:, cfg.min_note:cfg.max_note] = res.notes[gi]
            m = piece_metrics(roll)
            m["seed"] = seed
            generated[genre].append(m)

    # --- per-genre comparison --------------------------------------------
    pub_profiles = {g: np.mean([m["pitch_class_profile"]
                                for m in published[g]], axis=0)
                    for g in GENRE_NAMES}
    report = {"published_dir": REF_DIR,
              "params": os.path.relpath(args.params, REPO),
              "seeds": list(SEEDS), "bars": BARS,
              "temperature": temperature,
              # Control: how separable the PUBLISHED genres are from each
              # other on the same metric — the ceiling any generator's
              # diagonal can be judged against.
              "published_self_intersections": {
                  g1: {g2: round(profile_intersection(pub_profiles[g1],
                                                      pub_profiles[g2]), 4)
                       for g2 in GENRE_NAMES}
                  for g1 in GENRE_NAMES},
              "genres": {}}
    for genre in GENRE_NAMES:
        gen_profile = np.mean([m["pitch_class_profile"]
                               for m in generated[genre]], axis=0)
        inter = {g2: round(profile_intersection(gen_profile,
                                                pub_profiles[g2]), 4)
                 for g2 in GENRE_NAMES}
        report["genres"][genre] = {
            "published": published[genre],
            "generated": generated[genre],
            "summary": {
                "note_density": {
                    "published": round(_mean(published[genre],
                                             ["note_density"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["note_density"]), 3)},
                "polyphony": {
                    "published": round(_mean(published[genre],
                                             ["polyphony"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["polyphony"]), 3)},
                "velocity_mean": {
                    "published": round(_mean(published[genre],
                                             ["velocity", "mean"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["velocity", "mean"]), 3)},
                "velocity_std": {
                    "published": round(_mean(published[genre],
                                             ["velocity", "std"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["velocity", "std"]), 3)},
                "replay_rate": {
                    "published": round(_mean(published[genre],
                                             ["replay_rate"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["replay_rate"]), 3)},
                "autocorr_bar": {
                    "published": round(_mean(published[genre],
                                             ["autocorr_bar"]), 3),
                    "generated": round(_mean(generated[genre],
                                             ["autocorr_bar"]), 3)},
                "pitch_class_intersection_vs_published": inter,
            }}

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    # --- REPORT.md --------------------------------------------------------
    lines = [
        "# Generated vs published music (round 4)", "",
        "The real-corpus model "
        f"(`{os.path.relpath(args.params, REPO)}`, "
        "trained on the reference's nine published pieces) generating "
        f"{BARS}-bar pieces at T={temperature:g}, seeds {list(SEEDS)}, "
        "scored against the published pieces themselves "
        "(`archives/v1/long_samples/`).  Metrics: "
        "data/analysis.piece_metrics.", "",
        "| genre | metric | published (mean of 3) | generated (mean of "
        f"{len(SEEDS)}) |", "|---|---|---|---|"]
    for genre in GENRE_NAMES:
        s = report["genres"][genre]["summary"]
        for metric in ("note_density", "polyphony", "velocity_mean",
                       "velocity_std", "replay_rate", "autocorr_bar"):
            lines.append(f"| {genre} | {metric} | "
                         f"{s[metric]['published']} | "
                         f"{s[metric]['generated']} |")
    lines += ["", "Pitch-class histogram intersection of each genre's "
              "generated profile vs every genre's PUBLISHED profile "
              "(row = generated genre; diagonal should dominate; "
              "~0.33 = unrelated scales):", "",
              "| generated \\ published | " + " | ".join(GENRE_NAMES) + " |",
              "|---|" + "---|" * 3]
    for genre in GENRE_NAMES:
        inter = report["genres"][genre]["summary"][
            "pitch_class_intersection_vs_published"]
        lines.append(f"| {genre} | " + " | ".join(
            str(inter[g2]) for g2 in GENRE_NAMES) + " |")
    lines += ["", "Control — the published genres against each other "
              "(how separable the yardstick itself is):", "",
              "| published \\ published | " + " | ".join(GENRE_NAMES) + " |",
              "|---|" + "---|" * 3]
    for g1 in GENRE_NAMES:
        row = report["published_self_intersections"][g1]
        lines.append(f"| {g1} | " + " | ".join(
            str(row[g2]) for g2 in GENRE_NAMES) + " |")
    lines.append("")
    with open(os.path.join(args.out, "REPORT.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({g: report["genres"][g]["summary"]
                      for g in GENRE_NAMES}, indent=2))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
