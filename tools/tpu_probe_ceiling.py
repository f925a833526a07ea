#!/usr/bin/env python
"""Re-measurable ceiling probes behind docs/PERFORMANCE.md's "Where the
remaining 48.6 ms goes" (VERDICT r2 weak #6: the roofline argument must be
reproducible in one command, not prose).

Three on-chip measurements of the flagship train step (B=64, the bench
geometry), via the probe knobs in ops/pallas_biax.py:

  base   — production config (256-row tiles, real gate transcendentals)
  tile/2 — MAX_TILE_ROWS=128: double the sequential kernel invocations.
           The per-row work is unchanged, so the step-time delta prices
           the FIXED per-invocation (grid) overhead `a`.
  hard   — HARD_GATES=True: clip-based hard sigmoid/tanh (~5x fewer VPU
           transcendental ops).  The delta bounds what free
           transcendentals could ever buy.

Cost-model fit (docs/PERFORMANCE.md): attribute the step to its kernel
invocations, t(R rows) = a + R*b:
  a = (t_half - t_base) / (I_half - I_base)        (row work cancels)
  b = (t_base / I_base - a) / 256
Round-2 prose recorded a ≈ 0.54 us, b ≈ 27.6 ns/row, hard-gate gain ≈ 3%;
run this to re-derive or challenge those numbers.  Also prints the tape
traffic accounting (bytes from shapes, at the v5e's ~819 GB/s HBM).

Run on the TPU box:  python tools/tpu_probe_ceiling.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GB_PER_S = 819.0    # v5e HBM bandwidth


def measure_step_ms(cfg, steps: int, warmup: int) -> float:
    """Median-of-3 timing of `steps` chained train steps (fresh model/jit
    caches per call — the caller toggles pallas_biax knobs between calls)."""
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

    for _ in range(max(1, warmup)):      # >=1: the readback below needs it
        state, metrics = step(state, batch)
    float(metrics["loss"])          # real host readback (relay can ack early)

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])      # chained: one readback forces the run
        runs.append((time.perf_counter() - t0) / steps * 1000.0)
    return sorted(runs)[1]


def invocations_per_step(cfg, max_rows: int) -> tuple:
    """(invocations, rows_per_invocation) of the v3 biax kernels per train
    step: time stack grid T x (N/k) + note stack grid N x (T/k), forward
    AND backward (same tiling by construction)."""
    from music_generator_tpu.ops import pallas_biax

    B, T, N = cfg.batch_size, cfg.seq_len, cfg.num_notes
    kt, nj = pallas_biax._row_tiling(N, B, max_rows)
    kn, jt = pallas_biax._row_tiling(T, B, max_rows)
    assert kt * B == kn * B, "probe assumes equal tile rows in both stacks"
    return 2 * (T * nj + N * jt), kt * B


def tape_accounting(cfg) -> dict:
    """Bytes of recurrent tapes written forward + re-read backward per
    step (h tapes in compute dtype, c tapes f32)."""
    import numpy as np
    B, T, N = cfg.batch_size, cfg.seq_len, cfg.num_notes
    h_bytes = np.dtype(cfg.compute_dtype).itemsize
    time_tape = T * N * B * cfg.time_axis_units * (2 * h_bytes + 2 * 4)
    note_tape = N * T * B * cfg.note_axis_units * (2 * h_bytes + 2 * 4)
    total = 2 * (time_tape + note_tape)          # write + backward re-read
    return {"tape_gb_per_step": round(total / 1e9, 2),
            "tape_ms_at_hbm_rate": round(total / (HBM_GB_PER_S * 1e6), 2)}


def _reset_kernel_caches():
    import jax
    from music_generator_tpu.ops import pallas_biax
    pallas_biax._make_time_stack.cache_clear()
    pallas_biax._make_note_stack.cache_clear()
    jax.clear_caches()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    from music_generator_tpu.config import default_config
    from music_generator_tpu.ops import pallas_biax

    cfg = default_config().replace(batch_size=args.batch)

    # Validate the geometry BEFORE burning three multi-minute on-chip
    # compiles: the fit needs the halved tiling to actually change the
    # invocation count (it doesn't for batch >= 256), and both stacks must
    # agree on tile rows (they don't for batches like 40).
    try:
        i_base, r_base = invocations_per_step(cfg, 256)
        i_half, r_half = invocations_per_step(cfg, 128)
    except AssertionError as e:
        raise SystemExit(f"unsupported --batch geometry: {e}")
    if i_half == i_base:
        raise SystemExit(
            f"--batch {args.batch}: halving MAX_TILE_ROWS does not change "
            f"the tiling (batch rows already exceed the cap), so the "
            f"overhead fit is undefined — use a batch < 256")

    report = {"batch": args.batch, "steps": args.steps}
    report.update(tape_accounting(cfg))

    try:
        print("probe 1/3: base (256-row tiles)")
        t_base = measure_step_ms(cfg, args.steps, args.warmup)

        print("probe 2/3: halved tiles (grid-overhead pricing)")
        pallas_biax.MAX_TILE_ROWS = 128
        _reset_kernel_caches()
        t_half = measure_step_ms(cfg, args.steps, args.warmup)

        print("probe 3/3: hard gates (transcendental headroom)")
        pallas_biax.MAX_TILE_ROWS = 256
        pallas_biax.HARD_GATES = True
        _reset_kernel_caches()
        t_hard = measure_step_ms(cfg, args.steps, args.warmup)
    finally:
        pallas_biax.MAX_TILE_ROWS = 256
        pallas_biax.HARD_GATES = False
        _reset_kernel_caches()

    a_us = (t_half - t_base) * 1000.0 / (i_half - i_base)
    b_ns = (t_base * 1e6 / i_base - a_us * 1000.0) / r_base

    ts = args.batch * cfg.seq_len
    report.update({
        "step_ms": {"base": round(t_base, 2), "half_tile": round(t_half, 2),
                    "hard_gates": round(t_hard, 2)},
        "timesteps_per_sec": round(ts / t_base * 1000.0, 0),
        "invocations_per_step": {"base": i_base, "half_tile": i_half},
        "cost_model": {
            "fixed_us_per_invocation": round(a_us, 3),
            "ns_per_row": round(b_ns, 2),
            "note": "t(R rows) = a + R*b, whole step attributed to the "
                    "biax kernel invocations",
        },
        "hard_gate_gain_pct": round((t_base - t_hard) / t_base * 100.0, 1),
    })
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
