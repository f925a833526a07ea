#!/usr/bin/env python
"""The parallel-scan time-axis study (VERDICT r3 next #8): what does
moving the architectural throughput ceiling COST?

docs/PERFORMANCE.md's ceiling characterization showed the training step
is bound by the sequential recurrences; `Config.time_axis_kind="linear"`
(ops/linear_scan.py) replaces the time-axis LSTMs with a minGRU-style
gated linear recurrence that runs as an O(log T) associative scan.  This
tool measures BOTH sides of the trade on the chip:

1. **Throughput** — steady train-step timesteps/s at the headline B=16
   geometry (and B=64) for: baseline LSTM on the v3 fused Pallas path
   (the shipped best), baseline LSTM on plain XLA scans (the
   apples-to-apples software path), and the linear variant (XLA
   associative scan, no Pallas tuning at all).
2. **Quality** — loss trajectories of both architectures trained
   identically on the REAL corpus (the reference's nine published
   pieces, tools/run_real_corpus.py staging) to early-stop, plus
   pitch-class style fidelity of 16-bar generations from each best
   checkpoint.

Writes artifacts/parallel_scan_r4/report.json.  The variant ships
OFF by default regardless of outcome: it is a different (non-reference)
model family; the study prices the option.

Run on the TPU box:  python tools/run_parallel_scan_study.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_step(cfg, steps=60, warmup=3):
    import jax
    from music_generator_tpu.data.synth import random_batch
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.parallel.mesh import make_mesh, shard_batch
    from music_generator_tpu.parallel.train_step import (
        create_train_state, make_train_step)

    model = DeepJ(cfg)
    mesh = make_mesh()
    state, opt = create_train_state(model, seed=0)
    step = make_train_step(model, opt, mesh)
    batch = shard_batch(mesh, random_batch(cfg, rolled_targets=True))
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        runs.append((time.perf_counter() - t0) / steps)
    dt = sorted(runs)[1]
    return cfg.batch_size * cfg.seq_len / dt


def train_real(cfg, run_dir, epochs, patience):
    """Train on the staged real corpus; returns (losses, best, seconds)."""
    import numpy as np
    from music_generator_tpu.data.dataset import load_all
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.trainer import TrainConfig, Trainer

    cwd = os.getcwd()
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)
    try:
        from tools.run_real_corpus import stage_real_corpus
        from music_generator_tpu.training.checkpoint import build_or_load
        stage_real_corpus(cfg)
        ds = load_all(config=cfg)
        model = DeepJ(cfg)
        trainer = Trainer(model, TrainConfig(epochs=epochs,
                                             patience=patience))
        t0 = time.time()
        history = trainer.fit(ds)
        secs = time.time() - t0
        losses = [float(x) for x in history["loss"]]
        best_params, loaded = build_or_load(model)   # the best checkpoint
        assert loaded, "best checkpoint must restore"
        return model, best_params, losses, secs
    finally:
        os.chdir(cwd)


def fidelity_scores(model, best_params, cfg):
    """Pitch-class own-corpus overlap of 16-bar generations at the real
    corpus's three style slots (same scoring as tools/run_real_corpus.py)."""
    import numpy as np
    from music_generator_tpu.data.synth import pitch_class_histogram
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile
    from music_generator_tpu.utils import one_hot
    import glob as _glob

    from tools.run_real_corpus import GENRE_NAMES, REF_DIR
    sampler = Sampler(model, best_params)
    sids = [0, 3, 9]
    res = sampler.generate([one_hot(s, cfg.num_styles) for s in sids],
                           num_bars=16, seed=0, temperature=0.75)
    out = []
    for gi, genre in enumerate(GENRE_NAMES):
        h_gen = pitch_class_histogram(np.asarray(res.notes[gi]))
        h_corpus = np.zeros(12)
        for f in sorted(_glob.glob(os.path.join(REF_DIR, f"{genre} *.mid"))):
            h_corpus += pitch_class_histogram(
                midi_decode(read_midifile(f), cfg.midi_max_notes,
                            config=cfg)[:, cfg.min_note:cfg.max_note])
        h_corpus /= max(1e-9, h_corpus.sum())
        out.append({"genre": genre, "notes": int(res.notes[gi][..., 0].sum()),
                    "own_overlap": round(float(
                        np.minimum(h_gen, h_corpus).sum()), 4)})
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--patience", type=int, default=8)
    parser.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "parallel_scan_r4"))
    parser.add_argument("--run-root", default=os.path.join(
        REPO, "runs", "pscan"))
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    import jax
    from music_generator_tpu.config import default_config
    print("backend:", jax.default_backend())

    report = {"backend": jax.default_backend(), "throughput": {}}

    # --- throughput --------------------------------------------------------
    for B in (16, 64):
        base = default_config().replace(batch_size=B)
        rows = {}
        rows["lstm_pallas_v3"] = round(bench_step(base), 0)
        rows["lstm_xla"] = round(bench_step(
            base.replace(lstm_kernel="xla")), 0)
        rows["linear_xla"] = round(bench_step(
            base.replace(time_axis_kind="linear", lstm_kernel="xla")), 0)
        # The linear time axis composed with the LSTM note axis still on
        # the fused Pallas path is not a supported mix (the v3 kernel
        # fuses both axes) — the honest software-path comparison is
        # lstm_xla vs linear_xla; lstm_pallas_v3 is the shipped best.
        report["throughput"][f"B{B}_timesteps_per_sec"] = rows
        print(f"B={B}:", rows)

    # --- real-corpus quality ----------------------------------------------
    for kind in ("lstm", "linear"):
        cfg = default_config().replace(time_axis_kind=kind)
        run_dir = os.path.join(args.run_root, kind)
        model, best_params, losses, secs = train_real(
            cfg, run_dir, args.epochs, args.patience)
        scores = fidelity_scores(model, best_params, cfg)
        report[f"real_corpus_{kind}"] = {
            "epochs_run": len(losses),
            "first_loss": losses[0],
            "best_loss": min(losses),
            "train_seconds": round(secs, 1),
            "loss_curve": [round(x, 5) for x in losses],
            "fidelity_16bar": scores,
        }
        print(kind, "loss", losses[0], "->", min(losses),
              f"({len(losses)} epochs, {secs:.0f}s)", scores)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", os.path.join(args.out, "report.json"))


if __name__ == "__main__":
    main()
