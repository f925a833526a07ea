#!/usr/bin/env python
"""Re-measurable ceiling probes for the GENERATION step (VERDICT r3 next
#5: training has a roofline argument in one command —
tools/tpu_probe_ceiling.py — generation had only end-to-end numbers).

Decomposes the per-timestep cost of the on-device sampler at the
BASELINE-config-4 geometry (G parallel streams, default 64) into its
serial components, each timed as its own chained `lax.scan` on the chip:

  full       — the production `Sampler._step` scan (time axis + RNG +
               pitch scan + adaptive temperature), the number bench.py's
               generate metric reports
  time_axis  — scan of `model.time_axis_step` alone (2 LSTM cells over
               G*48 fused rows + octave conv features)
  note_scan  — scan of `Sampler._note_scan` alone on fixed features (48
               SEQUENTIAL note_axis_cell invocations interleaved with
               Bernoulli sampling — the autoregressive pitch loop)
  rng        — scan drawing the per-step stream-indexed uniforms alone
               (threefry fold_in + [G,48,2] uniform)
  chain_floor— scan of 96 dependent [G,:]@[:,512] matmuls at f32/highest
               (2 layers x 48 pitches of bare LSTM-shaped matmul chain,
               no gates/sampling): the pure sequential-matmul latency the
               pitch recurrence can never beat on this architecture

The gap `full - (time_axis + note_scan + rng)` prices the
temperature/state bookkeeping + scan plumbing; `note_scan / chain_floor`
says how close the pitch loop sits to its dependency-chain speed of
light.  The fused Pallas pitch kernel is probed against the XLA scan at
the same G (cfg.fused_gen_kernel both ways).

Writes runs/probe_gen.json (the artifact behind docs/PERFORMANCE.md's
generation-ceiling section).

Run on the TPU box:  python tools/tpu_probe_gen.py [--g 64 --bars 16]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_scan(jitted, init, steps_per_call, reps=5):
    """Median per-step ms of a jitted chained scan; forces completion with
    a float() readback of a scalar (relay-safe, bench.py discipline)."""
    carry = init
    carry, out = jitted(carry)          # compile
    float(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, out = jitted(carry)
        float(out)
        times.append((time.perf_counter() - t0) / steps_per_call * 1000.0)
    times.sort()
    return times[len(times) // 2]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--g", type=int, default=64,
                        help="parallel generation streams (BASELINE 64)")
    parser.add_argument("--bars", type=int, default=16,
                        help="bars per timed call (256 steps at 16)")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--out", default="runs/probe_gen.json")
    args = parser.parse_args(argv)

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import compute_genre
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.models.deepj import DeepJ, init_params

    G, T = args.g, args.bars * 16
    report = {"g": G, "steps_per_call": T,
              "backend": jax.default_backend()}

    base_cfg = default_config()
    params0 = init_params(jax.random.key(0), base_cfg)
    styles = [compute_genre(i % 3, base_cfg) for i in range(G)]

    # -- full production step, fused vs xla pitch path ---------------------
    for variant, fused in (("fused", True), ("xla", False)):
        cfg = base_cfg.replace(fused_gen_kernel=fused,
                               fused_gen_max_batch=max(
                                   G, base_cfg.fused_gen_max_batch))
        sampler = Sampler(DeepJ(cfg), params0)
        r = sampler.generate(styles, num_bars=args.bars, seed=0)  # compile
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            sampler.generate(styles, num_bars=args.bars, seed=1 + i)
            times.append((time.perf_counter() - t0) / T * 1000.0)
        times.sort()
        report[f"full_{variant}_ms_per_step"] = round(
            times[len(times) // 2], 3)
        print(f"full/{variant}: {report[f'full_{variant}_ms_per_step']} "
              f"ms/step  (all reps: {[round(t, 3) for t in times]})")

    # -- components (xla pitch path, the certified default) ----------------
    cfg = base_cfg
    model = Sampler(DeepJ(cfg), params0).model   # gen-dtype model
    params = params0
    sampler = Sampler(model, params)
    style_arr = jnp.asarray(np.stack(styles), jnp.float32)
    with jax.default_matmul_precision(cfg.gen_matmul_precision):
        style_emb = model.style_embedding(params, style_arr)
    N = cfg.num_notes

    prec = cfg.gen_matmul_precision

    @jax.jit
    def time_axis_only(carry):
        state, prev = carry
        def body(c, t):
            st, prev = c
            beat = jnp.broadcast_to(
                jax.nn.one_hot(t % 16, 16)[None], (G, 16))
            with jax.default_matmul_precision(prec):
                feats, st = model.time_axis_step(params, prev, beat,
                                                 style_emb, st)
            # feed a feats-derived row back so steps stay dependent
            prev = jnp.zeros((G, N, 3)) + feats.mean() * 1e-9
            return (st, prev), feats.mean()
        (state, prev), outs = jax.lax.scan(body, (state, prev),
                                           jnp.arange(T))
        return (state, prev), outs.sum()

    # The production per-(stream, t) uniform schedule, via the
    # sampler's own _step_uniforms (deviation #10) so the probe
    # can never drift from what generation actually computes
    # (review r4 finding: two inline copies measured a frozen
    # re-implementation).
    stream_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(G, dtype=jnp.uint32))

    @jax.jit
    def note_scan_only(carry):
        feats, acc = carry
        def body(c, t):
            feats, acc = c
            us = sampler._step_uniforms(stream_keys, t)
            with jax.default_matmul_precision(prec):
                notes = sampler._note_scan(params, feats, style_emb,
                                           jnp.ones((G,)), us)
            feats = feats + notes.sum() * 1e-9      # keep steps dependent
            return (feats, acc + notes.sum()), notes.sum()
        (feats, acc), outs = jax.lax.scan(body, (feats, acc),
                                          jnp.arange(T))
        return (feats, acc), outs.sum()

    @jax.jit
    def rng_only(carry):
        def body(acc, t):
            us = sampler._step_uniforms(stream_keys, t)
            return acc + us.sum(), us.sum()
        acc, outs = jax.lax.scan(body, carry, jnp.arange(T))
        return acc, outs.sum()

    # the bare dependency chain: per timestep, 48 pitches x 2 layers of
    # [G,in]@[in,4H] matmul with a data dependence between consecutive
    # pitches (as the real recurrence has), nothing else.
    k0 = params.note_axis[0].lstm.kernel.astype(jnp.float32)
    k1 = params.note_axis[1].lstm.kernel.astype(jnp.float32)
    in0, in1 = k0.shape[0], k1.shape[0]

    @jax.jit
    def chain_floor(carry):
        def body(x, _t):
            def pitch(h, _n):
                with jax.default_matmul_precision(prec):
                    a = (jnp.zeros((G, in0)) + h[:, :1]) @ k0
                    b = (jnp.zeros((G, in1)).at[:, :4].set(a[:, :4])) @ k1
                return b[:, :128] * 1e-9 + h, None
            h, _ = jax.lax.scan(pitch, x, jnp.arange(N))
            return h, h.sum()
        x, outs = jax.lax.scan(body, carry, jnp.arange(T))
        return x, outs.sum()

    state0 = (model.init_time_state(G), jnp.zeros((G, N, 3)))
    report["time_axis_ms_per_step"] = round(
        _time_scan(time_axis_only, state0, T, args.reps), 3)
    print("time_axis:", report["time_axis_ms_per_step"])

    feats0 = jnp.zeros((G, N, cfg.time_axis_units))
    report["note_scan_ms_per_step"] = round(
        _time_scan(note_scan_only, (feats0, jnp.zeros(())), T, args.reps), 3)
    print("note_scan:", report["note_scan_ms_per_step"])

    report["rng_ms_per_step"] = round(
        _time_scan(rng_only, jnp.zeros(()), T, args.reps), 3)
    print("rng:", report["rng_ms_per_step"])

    report["chain_floor_ms_per_step"] = round(
        _time_scan(chain_floor, jnp.zeros((G, 128)), T, args.reps), 3)
    print("chain_floor:", report["chain_floor_ms_per_step"])

    full = report["full_xla_ms_per_step"]
    parts = (report["time_axis_ms_per_step"]
             + report["note_scan_ms_per_step"] + report["rng_ms_per_step"])
    report["bookkeeping_ms_per_step"] = round(full - parts, 3)
    report["note_scan_vs_chain_floor"] = round(
        report["note_scan_ms_per_step"]
        / max(1e-9, report["chain_floor_ms_per_step"]), 2)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
