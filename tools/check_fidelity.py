#!/usr/bin/env python
"""Cross-backend byte-identity check (BASELINE.md fidelity target): MIDI
generated on the TPU chip at a fixed seed must be byte-identical to the
framework's own CPU run with the same params/seed.

Mechanics: the first invocation (TPU) saves the exact param values to
<out>/params.npz, generates .mid files for a seed/style matrix under
<out>/tpu[-variant]/, then re-invokes itself under JAX_PLATFORMS=cpu to
produce <out>/cpu/, byte-compares every file, and writes <out>/FIDELITY.json.

Variants on TPU:
  xla    — the lax.scan pitch loop (the same code path CPU uses)
  fused  — the Pallas fused pitch-loop kernel (opt-in)
  padded — xla path with the batch padded to 8 (the mesh-divisibility /
           serving-bucket shape); byte-equal to unpadded since the
           stream-indexed RNG (deviation #10)

Plus a second CPU child running under an 8-device virtual mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) through the SAME
auto-mesh sharded path a v5e-8 user hits by default — certifying that the
flagship multi-chip default emits the certified bytes (VERDICT r3 weak
#2/#3 closed).

Each variant's matrix covers solo (G=1), the CLI's 3-genre batch, and
(r4) a primed continuation per seed (teacher-forced through the solo
run's first half) — the primed-generation surface certifies
cross-backend too.

Run from /root/repo:  python tools/check_fidelity.py --out runs/fidelity
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (0, 1, 2, 3, 4, 5, 6, 7)
TRAINED_PARAMS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "trained_model_r4", "params.npz")


def _params_to_npz(params, path):
    import jax
    import numpy as np
    flat = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path, **flat)


def _params_from_npz(model, path):
    import jax
    import numpy as np
    from music_generator_tpu.models.deepj import init_params
    template = init_params(jax.random.key(0), model.cfg)
    data = np.load(path)
    leaves_kv = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in leaves_kv[0]]
    return jax.tree_util.tree_unflatten(leaves_kv[1], leaves)


def generate_suite(out_dir: str, variant: str, params_npz: str,
                   temperature: float = 1.0, bars: int = 4,
                   quantize_volume: bool = False) -> None:
    """Generate the seed/style matrix into out_dir with the given variant:
    'xla' (the default scan path), 'fused' (the Pallas pitch-loop kernel),
    'bf16' (the no-discipline control: bf16 compute, default matmul
    precision), 'padded' (xla with the batch padded to 8 — the
    mesh-divisibility / serving-bucket shape), or 'mesh8' (the auto-mesh
    sharded path over all local devices — run it in a child with 8 virtual
    CPU devices to exercise the v5e-8 default)."""
    import jax
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import compute_genre, unclamp_midi
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.midi.codec import midi_encode
    from music_generator_tpu.midi.io import write_midifile
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.utils import one_hot

    cfg = default_config().replace(
        lstm_kernel="auto" if variant == "fused" else "xla",
        fused_gen_kernel=(variant == "fused"),
        gen_volume_quantize=quantize_volume)
    if variant == "bf16":
        # The control: generation WITHOUT the backend-stability discipline
        # (bf16 compute, default matmul precision) — quantifies how much
        # the f32/highest discipline buys.
        cfg = cfg.replace(gen_dtype="bfloat16",
                          gen_matmul_precision="default")
    model = DeepJ(cfg)

    if os.path.exists(params_npz):
        params = _params_from_npz(model, params_npz)
    else:
        from music_generator_tpu.models.deepj import init_params
        params = init_params(jax.random.key(0), cfg)
        _params_to_npz(params, params_npz)

    mesh = None
    if variant == "mesh8":
        from music_generator_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    sampler = Sampler(model, params, mesh=mesh)
    pad_to = 8 if variant == "padded" else None
    os.makedirs(out_dir, exist_ok=True)
    print(f"[{jax.default_backend()}/{variant}] generating into {out_dir}")
    for seed in SEEDS:
        # Single-stream (G=1, the fused-kernel regime) + the CLI's default
        # 3-genre batch (G=3).
        solo_notes = None
        for tag, styles in (("solo", [one_hot(0, cfg.num_styles)]),
                            ("genres", [compute_genre(g, cfg)
                                        for g in range(3)])):
            result = sampler.generate(styles, num_bars=bars, seed=seed,
                                      temperature=temperature, pad_to=pad_to)
            if tag == "solo":
                solo_notes = result.notes
            for i in range(result.notes.shape[0]):
                mf = midi_encode(unclamp_midi(result.notes[i], cfg),
                                 config=cfg)
                write_midifile(
                    os.path.join(out_dir, f"{tag}_{seed}_{i}.mid"), mf)
        # Primed continuation (r4): teacher-force through the solo run's
        # first half, then continue.  The prime itself is certified
        # cross-backend by the solo row, so byte-equal primed files
        # certify the teacher-forced state advance + the continuation's
        # absolute-step RNG discipline end-to-end.
        prime = solo_notes[0, :(bars // 2) * cfg.notes_per_bar]
        result = sampler.generate([one_hot(0, cfg.num_styles)],
                                  num_bars=bars - bars // 2, seed=seed,
                                  temperature=temperature, pad_to=pad_to,
                                  prime=prime)
        mf = midi_encode(unclamp_midi(
            np.concatenate([prime, result.notes[0]]), cfg), config=cfg)
        write_midifile(os.path.join(out_dir, f"primed_{seed}_0.mid"), mf)


def _events_equal(fa: str, fb: str) -> bool:
    """Event-level identity: decode both .mid files and compare the
    play/replay planes (note content), ignoring volume bytes.  The r4
    flagship's knife edge was a single VOLUME byte 1.66e-4 from a
    rounding boundary while note events stayed 40/40 identical
    (docs/FIDELITY.md) — certificates record both levels so that
    distinction never needs a manual DIVERGENCE pass (VERDICT r4)."""
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile

    cfg = default_config()
    try:
        ra = midi_decode(read_midifile(fa), cfg.midi_max_notes, config=cfg)
        rb = midi_decode(read_midifile(fb), cfg.midi_max_notes, config=cfg)
    except Exception:
        # A file that doesn't even parse is certainly not event-identical.
        return False
    return ra.shape == rb.shape and bool(
        np.array_equal(ra[..., :2], rb[..., :2]))


def compare_dirs(a: str, b: str) -> dict:
    files = sorted(os.listdir(a))
    assert files == sorted(os.listdir(b)), "file sets differ"
    mismatches = [f for f in files
                  if open(os.path.join(a, f), "rb").read()
                  != open(os.path.join(b, f), "rb").read()]
    # Byte-identical files are trivially event-identical; only byte
    # mismatches need the decode-level comparison.
    event_mismatches = [f for f in mismatches
                        if not _events_equal(os.path.join(a, f),
                                             os.path.join(b, f))]
    return {"files": len(files), "mismatches": mismatches,
            "identical": not mismatches,
            "event_mismatches": event_mismatches,
            "event_identical": not event_mismatches}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="runs/fidelity")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="sampling temperature for the whole suite — "
                             "certify at non-default temperatures too (the "
                             "adaptive state machine makes T a first-class "
                             "part of the sampling math)")
    parser.add_argument("--bars", type=int, default=4,
                        help="piece length per generation — certify long "
                             "pieces too (recurrent-state drift grows with "
                             "length, so 32-bar identity is the stronger "
                             "claim; docs/FIDELITY.md)")
    parser.add_argument("--params", default=TRAINED_PARAMS,
                        help="params .npz to certify (default: the "
                             "committed trained checkpoint, "
                             "artifacts/trained_model_r4/params.npz); a "
                             "pre-seeded <out>/params.npz always wins")
    parser.add_argument("--random-init", action="store_true",
                        help="certify fresh random-init params instead of "
                             "a trained checkpoint (knife-edge analysis)")
    parser.add_argument("--quantize-volume", action="store_true",
                        help="certify with Config.gen_volume_quantize "
                             "(deviation #9): volumes snapped to the 1/127 "
                             "velocity grid during sampling")
    parser.add_argument("--phase", default="main",
                        choices=["main", "cpu-child", "cpu-mesh-child"])
    args = parser.parse_args(argv)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    params_npz = os.path.join(out, "params.npz")

    temp = args.temperature
    if args.phase in ("cpu-child", "cpu-mesh-child"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu"
        if args.phase == "cpu-mesh-child":
            # The v5e-8 default path on 8 virtual CPU devices (the parent
            # sets xla_force_host_platform_device_count=8): auto-mesh
            # sharded generation with the G=1/G=3 batches padded to 8.
            assert jax.device_count() == 8, jax.device_count()
            generate_suite(os.path.join(out, "cpu-mesh8"), "mesh8",
                           params_npz, temp, args.bars, args.quantize_volume)
        else:
            generate_suite(os.path.join(out, "cpu"), "xla", params_npz, temp,
                           args.bars, args.quantize_volume)
        return

    # Default trained-certification input: the committed checkpoint.  A
    # params.npz already in <out> is kept (pre-seeding wins) — but only
    # for the DEFAULT params selection: silently certifying stale params
    # under an explicit --random-init/--params (and then recording the
    # wrong params_source) would publish a mislabeled report.
    preseeded = os.path.exists(params_npz)
    params_source = ("random-init" if args.random_init
                     else f"{params_npz} (pre-seeded)" if preseeded
                     else args.params)
    if preseeded and (args.random_init or args.params != TRAINED_PARAMS):
        raise SystemExit(
            f"{params_npz} already exists and would override the explicit "
            f"--{'random-init' if args.random_init else 'params'} — remove "
            f"it or choose a fresh --out")
    if not preseeded and not args.random_init:
        if not os.path.exists(args.params):
            raise SystemExit(f"--params file not found: {args.params}")
        import shutil
        shutil.copy(args.params, params_npz)
        print(f"certifying trained params from {args.params}")

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    import jax
    backend = jax.default_backend()
    print("primary backend:", backend)
    generate_suite(os.path.join(out, f"{backend}-xla"), "xla", params_npz,
                   temp, args.bars, args.quantize_volume)
    generate_suite(os.path.join(out, f"{backend}-padded"), "padded",
                   params_npz, temp, args.bars, args.quantize_volume)
    if backend == "tpu":
        if not args.quantize_volume:
            # The fused kernel has no quantization path (sampler falls
            # back to the scan) — only certify it unquantized.
            generate_suite(os.path.join(out, f"{backend}-fused"), "fused",
                           params_npz, temp, args.bars)
        generate_suite(os.path.join(out, f"{backend}-bf16"), "bf16",
                       params_npz, temp, args.bars, args.quantize_volume)

    # CPU oracle + the 8-virtual-device auto-mesh path, each in a child
    # process (the backend / device count can't change in-process).
    base_env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    common = [sys.executable, os.path.abspath(__file__), "--out", out,
              "--temperature", str(temp), "--bars", str(args.bars)] \
        + (["--quantize-volume"] if args.quantize_volume else [])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(common + ["--phase", "cpu-child"],
                   check=True, env=base_env, cwd=repo)
    mesh_env = dict(base_env)
    mesh_env["XLA_FLAGS"] = (mesh_env.get("XLA_FLAGS", "")
                             + " --xla_force_host_platform_device_count=8")
    subprocess.run(common + ["--phase", "cpu-mesh-child"],
                   check=True, env=mesh_env, cwd=repo)

    report = {"backend": backend, "seeds": list(SEEDS), "bars": args.bars,
              "temperature": temp,
              "quantize_volume": args.quantize_volume,
              "params_source": params_source}
    report["xla_vs_cpu"] = compare_dirs(
        os.path.join(out, f"{backend}-xla"), os.path.join(out, "cpu"))
    report["padded_vs_cpu"] = compare_dirs(
        os.path.join(out, f"{backend}-padded"), os.path.join(out, "cpu"))
    report["mesh8_vs_cpu"] = compare_dirs(
        os.path.join(out, "cpu-mesh8"), os.path.join(out, "cpu"))
    if backend == "tpu":
        if not args.quantize_volume:
            report["fused_vs_cpu"] = compare_dirs(
                os.path.join(out, f"{backend}-fused"),
                os.path.join(out, "cpu"))
        report["bf16_vs_cpu"] = compare_dirs(
            os.path.join(out, f"{backend}-bf16"), os.path.join(out, "cpu"))
    with open(os.path.join(out, "FIDELITY.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
