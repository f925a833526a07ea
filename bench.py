#!/usr/bin/env python
"""Benchmark: training throughput in piano-roll timesteps/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio to the BASELINE.json north-star target of
100,000 timesteps/sec/chip (the reference publishes no numbers of its own —
BASELINE.md).  A timestep is one piano-roll row of one sequence, so a batch
contributes batch_size × seq_len timesteps per optimizer step (the
geometry derived in SURVEY.md §6).

Flags let the driver/bench explore geometry; defaults favor throughput on a
single v5e chip while keeping the reference model dimensions fixed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


TARGET_TIMESTEPS_PER_SEC = 100_000.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64,
                        help="global batch size")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--kernel", type=str, default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "generate"])
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from music_generator_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from music_generator_tpu.config import default_config
    from music_generator_tpu.models.deepj import DeepJ

    cfg = default_config().replace(batch_size=args.batch,
                                   lstm_kernel=args.kernel)
    model = DeepJ(cfg)
    n_chips = jax.device_count()

    if args.mode == "train":
        from music_generator_tpu.parallel.mesh import make_mesh, shard_batch
        from music_generator_tpu.parallel.train_step import (
            create_train_state, make_train_step)

        mesh = make_mesh()
        state, opt = create_train_state(model, seed=0)
        step = make_train_step(model, opt, mesh)

        B, T, N = cfg.batch_size, cfg.seq_len, cfg.num_notes
        rng = np.random.default_rng(0)
        notes = (rng.random((B, T, N, 3)) < 0.1).astype(np.float32)
        targets = np.roll(notes, -1, axis=1)
        beats = np.zeros((B, T, cfg.notes_per_bar), np.float32)
        beats[:, np.arange(T), np.arange(T) % cfg.notes_per_bar] = 1
        styles = np.zeros((B, T, cfg.num_styles), np.float32)
        styles[..., 0] = 1
        batch = shard_batch(mesh, (notes, targets, beats, styles))

        for _ in range(args.warmup):
            state, metrics = step(state, batch)
        float(metrics["loss"])    # full host readback: the relay's
                                  # block_until_ready can ack early

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        # The steps chain through `state`, so reading the last loss to host
        # forces completion of the whole sequence.
        float(metrics["loss"])
        dt = time.perf_counter() - t0

        timesteps = args.steps * B * T
        value = timesteps / dt / n_chips
        print(json.dumps({
            "metric": "train_timesteps_per_sec_per_chip",
            "value": round(value, 1),
            "unit": "piano-roll timesteps/s/chip",
            "vs_baseline": round(value / TARGET_TIMESTEPS_PER_SEC, 3),
        }))
    else:
        from music_generator_tpu.data.dataset import compute_genre
        from music_generator_tpu.generation.sampler import Sampler
        from music_generator_tpu.models.deepj import init_params

        params = init_params(jax.random.key(0), cfg)
        sampler = Sampler(model, params)
        styles = [compute_genre(i % 3, cfg) for i in range(args.batch)]

        bars = 8
        r = sampler.generate(styles, num_bars=bars, seed=0)   # compile
        float(r.notes.sum())
        reps = 3   # average out relay jitter; results reach host per call
        t0 = time.perf_counter()
        for i in range(reps):
            result = sampler.generate(styles, num_bars=bars, seed=1 + i)
        dt = time.perf_counter() - t0
        steps = reps * bars * cfg.notes_per_bar
        ms_per_step = dt / steps * 1000.0
        # Baseline target: < 5 ms/timestep → vs_baseline = target / actual
        # (>1 is better than target).
        print(json.dumps({
            "metric": "generate_ms_per_timestep",
            "value": round(ms_per_step, 3),
            "unit": f"ms/timestep ({args.batch} parallel generations)",
            "vs_baseline": round(5.0 / ms_per_step, 3),
        }))


if __name__ == "__main__":
    main()
