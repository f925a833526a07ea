#!/usr/bin/env python
"""Full-size convergence run: the rebuild's analogue of the reference's
fit-to-convergence + published samples (ref: train.py:29, archives/v1/**).

Trains the FLAGSHIP default_config geometry on a deterministic synthetic
musical corpus (data/synth.py) until early-stop, then generates samples from
the best checkpoint and scores their pitch-class fidelity per style.
Artifacts land in <run_dir>/:

  out/logs/metrics.jsonl   per-step + per-epoch losses (the loss curve)
  out/model.ckpt           best-loss checkpoint
  out/samples/*.mid        generated pieces per trained style
  report.json              loss curve summary + fidelity scores + throughput

Run from /root/repo (no PYTHONPATH — it breaks this box's TPU init):
  python tools/run_convergence.py --run-dir runs/convergence
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-dir", default="runs/convergence")
    parser.add_argument("--styles", type=int, nargs="*",
                        default=[0, 1, 3, 4, 9, 10])   # 2 per genre
    parser.add_argument("--files-per-style", type=int, default=3)
    parser.add_argument("--bars", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--sample-bars", type=int, default=16)
    parser.add_argument("--temperature", type=float, default=0.75)
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import load_all
    from music_generator_tpu.data.synth import (
        pitch_class_histogram, synth_piece, write_synth_corpus)
    from music_generator_tpu.generation.sampler import Sampler, write_file
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.checkpoint import build_or_load
    from music_generator_tpu.training.trainer import TrainConfig, Trainer
    from music_generator_tpu.utils import one_hot

    import jax
    print("backend:", jax.default_backend(), jax.devices())

    run_dir = os.path.abspath(args.run_dir)
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)

    cfg = default_config()
    write_synth_corpus(".", styles=args.styles,
                       files_per_style=args.files_per_style, bars=args.bars,
                       config=cfg)
    t0 = time.time()
    ds = load_all(config=cfg)
    load_s = time.time() - t0
    print(f"{len(ds)} training windows (loaded in {load_s:.1f}s)")

    model = DeepJ(cfg)
    trainer = Trainer(model, TrainConfig(epochs=args.epochs,
                                         patience=args.patience))
    trainer.maybe_restore()
    t0 = time.time()
    history = trainer.fit(ds)
    train_s = time.time() - t0
    epochs_run = len(history["loss"])
    # Steady-state epoch throughput: median epoch wall time excluding
    # epoch 0 (which pays the compile).  Geometry comes from the trainer's
    # history — fit() may clamp/round the batch on tiny or mesh-indivisible
    # corpora, and the report must count what actually ran.
    ts_per_epoch = (history["steps_per_epoch"][0] * history["batch_size"]
                    * cfg.seq_len)
    steady = sorted(history["epoch_seconds"][1:]) or history["epoch_seconds"]
    median_epoch_s = steady[len(steady) // 2]

    print(f"trained {epochs_run} epochs in {train_s:.0f}s; "
          f"loss {history['loss'][0]:.4f} -> {min(history['loss']):.4f}")

    # --- generate from the BEST checkpoint -------------------------------
    params, loaded = build_or_load(model)
    assert loaded, "best checkpoint must restore"
    sampler = Sampler(model, params)
    mixtures = [one_hot(s, cfg.num_styles) for s in args.styles]
    result = sampler.generate(mixtures, num_bars=args.sample_bars, seed=0,
                              temperature=args.temperature)
    paths = write_file("trained", result, cfg)

    # --- fidelity: generated pitch classes vs each style's corpus --------
    fidelity = []
    for i, style_id in enumerate(args.styles):
        gen = result.notes[i]
        h_gen = pitch_class_histogram(gen)
        corpus_roll = synth_piece(style_id, bars=args.bars, seed=0,
                                  config=cfg)[:, cfg.min_note:cfg.max_note]
        h_own = pitch_class_histogram(corpus_roll)
        others = [
            float(np.minimum(h_gen, pitch_class_histogram(
                synth_piece(s, bars=args.bars, seed=0,
                            config=cfg)[:, cfg.min_note:cfg.max_note])).sum())
            for s in args.styles if s != style_id]
        fidelity.append({
            "style": style_id,
            "notes": int(gen[..., 0].sum()),
            "own_overlap": float(np.minimum(h_gen, h_own).sum()),
            "max_other_overlap": max(others),
            # Replay measured on the RAW sampled roll — a decode of the
            # written .mid always reads 0 here because midi_encode's
            # same-instant off+on replay pairs land on the frame grid
            # where the decoder's pinned quirk suppresses them
            # (codec.py module doc).
            "replay_rate": float(gen[..., 1].sum()
                                 / max(1, (gen[..., 0] > 0).sum())),
            "corpus_replay_rate": float(
                corpus_roll[..., 1].sum()
                / max(1, (corpus_roll[..., 0] > 0).sum())),
            "sample": paths[i],
        })
        print(f"style {style_id}: own={fidelity[-1]['own_overlap']:.3f} "
              f"max_other={fidelity[-1]['max_other_overlap']:.3f} "
              f"notes={fidelity[-1]['notes']} "
              f"replay={fidelity[-1]['replay_rate']:.4f} "
              f"(corpus {fidelity[-1]['corpus_replay_rate']:.4f})")

    report = {
        "backend": jax.default_backend(),
        "config": "default_config (flagship dims)",
        "windows": len(ds),
        "epochs_run": epochs_run,
        "first_loss": history["loss"][0],
        "best_loss": min(history["loss"]),
        "loss_curve": history["loss"],
        "train_seconds": train_s,
        "median_epoch_seconds": median_epoch_s,
        "steady_epoch_timesteps_per_sec": ts_per_epoch / median_epoch_s,
        "fidelity": fidelity,
    }
    with open("report.json", "w") as f:
        json.dump(report, f, indent=2)
    print("report written to", os.path.join(run_dir, "report.json"))


if __name__ == "__main__":
    main()
