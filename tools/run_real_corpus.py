#!/usr/bin/env python
"""End-to-end training on the reference's REAL published MIDI files — the
only genuine (non-synthetic) musical corpus available in this image
(/root/reference/archives/v1/long_samples: nine python-midi-written
64-bar pieces, three per genre).

This exercises the entire real-data path at once: SMF parse → native
decode → .npy cache → clamp/window → flagship training to early-stop on
the chip → generation from the best checkpoint → pitch-class scoring of
the samples against the real training pieces.  The synthetic-corpus
convergence runs (tools/run_convergence.py) prove the model learns; this
proves the pipeline holds on real-world files end to end.

The nine files are staged into the config's own data/<genre>/<composer>
taxonomy (first composer slot of each genre), so `load_all(config=cfg)`
consumes them exactly as a user corpus.

Run on the TPU box:  python tools/run_real_corpus.py --run-dir runs/real
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/archives/v1/long_samples"
GENRE_NAMES = ["Baroque", "Classical", "Romantic"]


def stage_real_corpus(cfg, root="."):
    """Copy the reference's nine real pieces into the stock
    data/<genre>/<composer> taxonomy under `root` (first composer slot of
    each genre).  Returns (style_ids, {style_id: [staged paths]})."""
    style_ids, genre_files = [], {}
    flat = 0
    for g, composers in enumerate(cfg.styles):
        style_ids.append(flat)
        d = os.path.join(root, composers[0])
        os.makedirs(d, exist_ok=True)
        files = sorted(glob.glob(os.path.join(REF_DIR,
                                              f"{GENRE_NAMES[g]} *.mid")))
        assert len(files) == 3, files
        genre_files[flat] = []
        for f in files:
            dst = os.path.join(d, os.path.basename(f).replace(" ", "_"))
            shutil.copy(f, dst)
            genre_files[flat].append(dst)
        flat += len(composers)
    return style_ids, genre_files


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-dir", default="runs/real")
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--sample-bars", type=int, default=16)
    parser.add_argument("--temperature", type=float, default=0.75)
    parser.add_argument("--transpose-augment", type=int, default=0,
                        help="max semitone shift for training augmentation "
                             "(0 = reference-faithful, off)")
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import clamp_midi, load_all
    from music_generator_tpu.data.synth import pitch_class_histogram
    from music_generator_tpu.generation.sampler import Sampler, write_file
    from music_generator_tpu.midi.codec import load_midi
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.checkpoint import build_or_load
    from music_generator_tpu.training.trainer import TrainConfig, Trainer
    from music_generator_tpu.utils import one_hot

    import jax
    print("backend:", jax.default_backend())

    run_dir = os.path.abspath(args.run_dir)
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)

    cfg = default_config()
    if args.transpose_augment:
        cfg = cfg.replace(transpose_augment=args.transpose_augment)
    # Stage each genre's three pieces under the genre's FIRST composer
    # directory of the stock taxonomy, so style conditioning uses the
    # config's real one-hot slots.
    genre_names = GENRE_NAMES
    style_ids, genre_files = stage_real_corpus(cfg)

    t0 = time.time()
    ds = load_all(config=cfg)
    load_s = time.time() - t0
    print(f"{len(ds)} training windows from 9 real files "
          f"(loaded in {load_s:.1f}s)")
    assert len(ds) > 0

    model = DeepJ(cfg)
    trainer = Trainer(model, TrainConfig(epochs=args.epochs,
                                         patience=args.patience))
    trainer.maybe_restore()
    t0 = time.time()
    history = trainer.fit(ds)
    train_s = time.time() - t0
    epochs_run = len(history["loss"])
    print(f"trained {epochs_run} epochs in {train_s:.0f}s; "
          f"loss {history['loss'][0]:.4f} -> {min(history['loss']):.4f}")

    # --- generate from the BEST checkpoint -------------------------------
    params, loaded = build_or_load(model)
    assert loaded, "best checkpoint must restore"
    sampler = Sampler(model, params)
    mixtures = [one_hot(s, cfg.num_styles) for s in style_ids]
    result = sampler.generate(mixtures, num_bars=args.sample_bars, seed=0,
                              temperature=args.temperature)
    paths = write_file("real_trained", result, cfg)

    # --- score: generated pitch classes vs the REAL genre corpora --------
    def corpus_hist(sid):
        rolls = [clamp_midi(load_midi(os.path.relpath(f), cfg), cfg)
                 for f in genre_files[sid]]
        return pitch_class_histogram(np.concatenate(rolls))

    hists = {sid: corpus_hist(sid) for sid in style_ids}
    fidelity = []
    for i, sid in enumerate(style_ids):
        h_gen = pitch_class_histogram(result.notes[i])
        others = [float(np.minimum(h_gen, hists[o]).sum())
                  for o in style_ids if o != sid]
        fidelity.append({
            "style": sid,
            "genre": genre_names[i],
            "notes": int(result.notes[i][..., 0].sum()),
            "own_overlap": float(np.minimum(h_gen, hists[sid]).sum()),
            "max_other_overlap": max(others),
            "sample": paths[i],
        })
        print(f"{genre_names[i]} (style {sid}): "
              f"own={fidelity[-1]['own_overlap']:.3f} "
              f"max_other={fidelity[-1]['max_other_overlap']:.3f} "
              f"notes={fidelity[-1]['notes']}")

    report = {
        "backend": jax.default_backend(),
        "corpus": "the reference's 9 real published .mid files "
                  "(archives/v1/long_samples), 3 per genre",
        "windows": len(ds),
        "transpose_augment": cfg.transpose_augment,
        "epochs_run": epochs_run,
        "first_loss": history["loss"][0],
        "best_loss": min(history["loss"]),
        "loss_curve": history["loss"],
        "train_seconds": train_s,
        "fidelity": fidelity,
    }
    with open("report.json", "w") as f:
        json.dump(report, f, indent=2)
    print("report written to", os.path.join(run_dir, "report.json"))


if __name__ == "__main__":
    main()
