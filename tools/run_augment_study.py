#!/usr/bin/env python
"""Octave/semitone-transpose augmentation study (the BASELINE.json
north-star extension; no reference counterpart — the reference trains on
raw pieces only, ref: dataset.py:39-76).

Trains the flagship geometry twice on the same synthetic corpus — once
plain, once with `Config.transpose_augment` adding ±k-semitone copies of
every piece (data/dataset.py::transpose_augment) — then evaluates BOTH
models on TWO eval families, each at -1/0/+1 semitone shifts (the same
transform the augmentation uses):

  * "train" family — the training pieces themselves, shifted.  Holding the
    music fixed isolates PITCH INVARIANCE: a model that merely memorized
    the training keys degrades the moment the same music moves a semitone.
  * "heldout" family — pieces with disjoint seeds (same styles), shifted.
    Measures generalization to new music; on a tiny corpus this is
    dominated by memorization, so read it alongside, not instead of, the
    invariance matrix.

Artifacts in <run_dir>/report.json: both loss histories + the
(model x family x shift) eval-loss matrices.  Run from /root/repo
(no PYTHONPATH):
  python tools/run_augment_study.py --run-dir runs/augment
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Disjoint from the training pieces' seeds (0..files_per_style-1): the eval
# corpora are held-out MUSIC, not transposed copies of the train set.
EVAL_SEED = 100


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
    from music_generator_tpu.data.synth import write_synth_corpus
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.trainer import TrainConfig, Trainer

    print("backend:", jax.default_backend())
    run_dir = os.path.abspath(args.run_dir)
    base_cfg = default_config()

    # --- corpora: the training set + both eval families per shift --------
    train_root = os.path.join(run_dir, "corpus")
    write_synth_corpus(train_root, styles=args.styles,
                       files_per_style=args.files_per_style, bars=args.bars,
                       config=base_cfg)
    eval_roots = {}
    for family, seed in (("train", 0), ("heldout", EVAL_SEED)):
        for shift in (-1, 0, 1):
            root = os.path.join(run_dir, f"eval_{family}_shift{shift:+d}")
            write_synth_corpus(root, styles=args.styles,
                               files_per_style=args.files_per_style,
                               bars=args.bars, seed=seed, shift=shift,
                               config=base_cfg)
            eval_roots[(family, shift)] = root

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
        # Evaluate the BEST checkpoint, not the early-stop-degraded final
        # state (round-3 review fix; the committed r2 matrices were
        # measured pre-fix — their 20x-scale effects dwarf the
        # few-percent best-vs-final delta).
        assert trainer.maybe_restore(), "best checkpoint must restore"
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

    # --- the (model x family x shift) eval matrices -----------------------
    matrix = {name: {"train": {}, "heldout": {}} for name in trainers}
    for (family, shift), root in sorted(eval_roots.items()):
        os.chdir(root)
        ds_eval = load_all(config=base_cfg.replace(
            out_dir=os.path.join(root, "out")))
        for name, trainer in trainers.items():
            loss = trainer.evaluate(ds_eval)["loss"]
            matrix[name][family][f"shift{shift:+d}"] = loss
            print(f"[{name}] eval {family} shift{shift:+d}: loss={loss:.4f}")

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
