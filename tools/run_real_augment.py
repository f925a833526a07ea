#!/usr/bin/env python
"""Transpose-augmentation invariance study on the REAL corpus — extends
the synthetic-corpus study (tools/run_augment_study.py, docs/TRAINING.md)
to the reference's nine genuine published pieces.

Trains the flagship geometry twice on the staged real corpus — plain and
with `Config.transpose_augment=1` — then evaluates BOTH models on the
training windows shifted by -1/0/+1 semitones via the SAME clamped-window
transform training augmentation uses (data/dataset.py::transpose_augment;
only the "train family shifted" invariance matrix exists here — nine real
pieces leave nothing to hold out).

Run on the TPU box:  python tools/run_real_augment.py --run-dir runs/realaug
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-dir", default="runs/realaug")
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--augment", type=int, default=1)
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import jax
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import (
        Dataset, load_all, transpose_augment)
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.trainer import TrainConfig, Trainer
    from run_real_corpus import stage_real_corpus

    print("backend:", jax.default_backend())
    run_dir = os.path.abspath(args.run_dir)
    corpus = os.path.join(run_dir, "corpus")
    os.makedirs(corpus, exist_ok=True)
    base_cfg = default_config()
    stage_real_corpus(base_cfg, corpus)

    results, trainers = {}, {}
    ds0 = None
    for name, k in (("baseline", 0), ("augmented", args.augment)):
        cfg = base_cfg.replace(out_dir=os.path.join(run_dir, name, "out"),
                               transpose_augment=k)
        os.chdir(corpus)
        ds = load_all(config=cfg)
        if k == 0:
            ds0 = ds          # the unaugmented windows double as eval base
        print(f"[{name}] {len(ds)} training windows (transpose_augment={k})")
        trainer = Trainer(DeepJ(cfg), TrainConfig(epochs=args.epochs,
                                                  patience=args.patience))
        t0 = time.time()
        history = trainer.fit(ds)
        # Score the BEST checkpoint fit() saved — after early stop the
        # in-memory state is `patience` degraded epochs past it, and the
        # report's best_loss describes the checkpoint.
        assert trainer.maybe_restore(), "best checkpoint must restore"
        results[name] = {
            "transpose_augment": k,
            "windows": len(ds),
            "epochs_run": len(history["loss"]),
            "first_loss": history["loss"][0],
            "best_loss": min(history["loss"]),
            "train_seconds": time.time() - t0,
        }
        trainers[name] = trainer
        print(f"[{name}] loss {history['loss'][0]:.4f} -> "
              f"{min(history['loss']):.4f} in {len(history['loss'])} epochs")

    # --- invariance matrix: the real windows, shifted in-memory ----------
    matrix = {name: {} for name in trainers}
    for shift in (-1, 0, 1):
        ds_s = Dataset(
            np.stack([transpose_augment(w, shift) for w in ds0.notes]),
            np.stack([transpose_augment(w, shift) for w in ds0.targets]),
            ds0.beats, ds0.styles)
        for name, trainer in trainers.items():
            loss = trainer.evaluate(ds_s)["loss"]
            matrix[name][f"shift{shift:+d}"] = loss
            print(f"[{name}] eval shift{shift:+d}: loss={loss:.4f}")

    report = {
        "backend": jax.default_backend(),
        "corpus": "the reference's 9 real published .mid files",
        "runs": results,
        "eval_loss": matrix,
    }
    with open(os.path.join(run_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("report written to", os.path.join(run_dir, "report.json"))


if __name__ == "__main__":
    main()
