#!/usr/bin/env python
"""Octave/semitone-transpose augmentation study (the BASELINE.json
north-star extension; no reference counterpart — the reference trains on
raw pieces only, ref: dataset.py:39-76).

Trains the flagship geometry twice on the same synthetic corpus — once
plain, once with `Config.transpose_augment` adding ±k-semitone copies of
every piece (data/dataset.py::transpose_augment) — then evaluates BOTH
models on held-out corpora transposed by -1/0/+1 semitones.  The claim
under test: augmentation buys invariance (the augmented model's eval loss
on shifted music stays near its clean loss; the baseline's blows up).

Artifacts in <run_dir>/report.json: both loss histories + the full
(model x shift) eval-loss matrix.  Run from /root/repo (no PYTHONPATH):
  python tools/run_augment_study.py --run-dir runs/augment
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_shifted_corpus(root, shift, styles, files_per_style, bars, cfg):
    """The synth corpus with every piece transposed by `shift` semitones
    (written through the normal encode path, so eval data passes the whole
    load pipeline)."""
    import numpy as np

    from music_generator_tpu.data.synth import synth_piece
    from music_generator_tpu.midi.codec import midi_encode
    from music_generator_tpu.midi.io import write_midifile

    for sid in styles:
        d = os.path.join(root, cfg.flat_styles[sid])
        os.makedirs(d, exist_ok=True)
        for i in range(files_per_style):
            roll = synth_piece(sid, bars=bars, seed=i, config=cfg)
            out = np.zeros_like(roll)
            if shift > 0:
                out[:, shift:] = roll[:, :-shift]
            elif shift < 0:
                out[:, :shift] = roll[:, -shift:]
            else:
                out = roll
            write_midifile(os.path.join(d, f"synth_{sid}_{i}.mid"),
                           midi_encode(out, step=1, config=cfg))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-dir", default="runs/augment")
    parser.add_argument("--styles", type=int, nargs="*", default=[0, 1, 3])
    parser.add_argument("--files-per-style", type=int, default=3)
    parser.add_argument("--bars", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=120)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--augment", type=int, default=1,
                        help="transpose_augment k for the augmented run "
                             "(adds shifts -k..k)")
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import jax

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import load_all
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.trainer import TrainConfig, Trainer

    print("backend:", jax.default_backend())
    run_dir = os.path.abspath(args.run_dir)
    base_cfg = default_config()

    # --- corpora: one per training variant + one per eval shift ----------
    train_root = os.path.join(run_dir, "corpus")
    write_shifted_corpus(train_root, 0, args.styles, args.files_per_style,
                         args.bars, base_cfg)
    eval_roots = {}
    for shift in (-1, 0, 1):
        root = os.path.join(run_dir, f"eval_shift{shift:+d}")
        write_shifted_corpus(root, shift, args.styles, args.files_per_style,
                             args.bars, base_cfg)
        eval_roots[shift] = root

    # --- train both variants on the SAME corpus --------------------------
    results = {}
    trainers = {}
    for name, k in (("baseline", 0), ("augmented", args.augment)):
        cfg = base_cfg.replace(out_dir=os.path.join(run_dir, name, "out"),
                               transpose_augment=k)
        os.chdir(train_root)
        ds = load_all(config=cfg)
        print(f"[{name}] {len(ds)} training windows (transpose_augment={k})")
        trainer = Trainer(DeepJ(cfg), TrainConfig(epochs=args.epochs,
                                                  patience=args.patience))
        t0 = time.time()
        history = trainer.fit(ds)
        results[name] = {
            "transpose_augment": k,
            "windows": len(ds),
            "epochs_run": len(history["loss"]),
            "first_loss": history["loss"][0],
            "best_loss": min(history["loss"]),
            "train_seconds": time.time() - t0,
            "loss_curve": history["loss"],
        }
        trainers[name] = trainer
        print(f"[{name}] loss {history['loss'][0]:.4f} -> "
              f"{min(history['loss']):.4f} in {len(history['loss'])} epochs")

    # --- the (model x shift) eval matrix ----------------------------------
    matrix = {name: {} for name in trainers}
    for shift, root in eval_roots.items():
        os.chdir(root)
        ds_eval = load_all(config=base_cfg.replace(
            out_dir=os.path.join(root, "out")))
        for name, trainer in trainers.items():
            loss = trainer.evaluate(ds_eval)["loss"]
            matrix[name][f"shift{shift:+d}"] = loss
            print(f"[{name}] eval shift{shift:+d}: loss={loss:.4f}")

    report = {
        "backend": jax.default_backend(),
        "config": "default_config (flagship dims)",
        "styles": args.styles,
        "runs": results,
        "eval_loss": matrix,
    }
    with open(os.path.join(run_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("report written to", os.path.join(run_dir, "report.json"))


if __name__ == "__main__":
    main()
