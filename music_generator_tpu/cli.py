"""Command-line entry points.

`train` is zero-arg like the reference (ref: train.py:14-29, which defines no
flags); `generate` exposes --bars/--styles with identical semantics to
ref: generate.py:137-148; `visualize` exports the style-embedding TSVs
(ref: visualize.py:11-43).  A few TPU-era extras (--seed, --epochs,
--temperature, --out) are additive.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from music_generator_tpu.config import default_config
from music_generator_tpu.utils.compile_cache import enable as _enable_compile_cache
from music_generator_tpu.data.dataset import compute_genre, load_all
from music_generator_tpu.generation.sampler import Sampler, write_file
from music_generator_tpu.models.deepj import DeepJ
from music_generator_tpu.training.checkpoint import build_or_load
from music_generator_tpu.training.trainer import (TrainConfig, Trainer,
                                                   maybe_init_distributed)
from music_generator_tpu.utils import one_hot


def train_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Trains the model.")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Max epochs (default: config value, 1000)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-resume", action="store_true",
                        help="Skip loading an existing checkpoint")
    parser.add_argument("--profile", action="store_true",
                        help="Write an XLA profiler trace of early steps")
    parser.add_argument("--from-keras", type=str, default=None,
                        metavar="MODEL_H5",
                        help="Warm-start from a reference (Keras 2) "
                             "model.h5 (optimizer state starts fresh)")
    args = parser.parse_args(argv)

    _enable_compile_cache()
    maybe_init_distributed()
    cfg = default_config()
    model = DeepJ(cfg)

    print("Loading data")
    ds = load_all(cfg.styles, cfg.seq_len, cfg)
    print(f"{len(ds)} training windows")

    import jax
    if jax.process_count() > 1:
        ds = ds.shard(jax.process_index(), jax.process_count())
    trainer = Trainer(model, TrainConfig(seed=args.seed, profile=args.profile))
    if args.from_keras:
        from music_generator_tpu.training.keras_import import (
            load_keras_weights)
        imported = load_keras_weights(args.from_keras, cfg)
        trainer.state = trainer.state._replace(
            params=jax.tree.map(jax.numpy.asarray, imported))
        print(f"Warm-started from Keras weights: {args.from_keras}")
    elif not args.no_resume:
        trainer.maybe_restore()

    print("Training")
    trainer.fit(ds, epochs=args.epochs)


def generate_main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Generates music.")
    parser.add_argument("--bars", default=32, type=int,
                        help="Number of bars to generate")
    parser.add_argument("--styles", default=None, type=int, nargs="+",
                        help="Styles to mix together")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--out", type=str, default="output",
                        help="Output file name prefix")
    parser.add_argument("--sweep", type=int, nargs=3, default=None,
                        metavar=("STYLE_A", "STYLE_B", "N"),
                        help="Generate N samples interpolating the style "
                             "mixture from STYLE_A to STYLE_B in parallel "
                             "(batched on-device generation)")
    parser.add_argument("--from-keras", type=str, default=None,
                        metavar="MODEL_H5",
                        help="Load weights from a reference (Keras 2) "
                             "model.h5 instead of this framework's "
                             "checkpoint")
    parser.add_argument("--quantize-volume", action="store_true",
                        help="Snap sampled volumes to the 1/127 MIDI "
                             "velocity grid (opt-in deviation #9, "
                             "docs/MIGRATION.md — changes the sampled "
                             "bytes vs the default raw copy-through)")
    parser.add_argument("--keras2-gates", action="store_true",
                        help="Run LSTM gates with Keras 2's hard_sigmoid "
                             "(clip(0.2x+0.5,0,1)) instead of exact "
                             "sigmoid — use with --from-keras weights "
                             "that were TRAINED in the reference codebase "
                             "so they keep their original gate math "
                             "(deviation #12, docs/MIGRATION.md; "
                             "validated against real Keras by "
                             "tools/keras_oracle.py)")
    parser.add_argument("--prime", type=str, default=None, metavar="MIDI",
                        help="Continue composing from an existing .mid "
                             "file: the streaming state is teacher-forced "
                             "through it, then --bars NEW bars are "
                             "generated from where it leaves off (a "
                             "capability extension — the reference always "
                             "generates from silence)")
    parser.add_argument("--prime-bars", type=int, default=None,
                        help="Use only the first K bars of --prime")
    parser.add_argument("--continuation-only", action="store_true",
                        help="With --prime: write only the newly generated "
                             "bars instead of prime + continuation")
    args = parser.parse_args(argv)

    _enable_compile_cache()
    # Multi-host pods: initialize jax.distributed BEFORE any backend touch
    # so the sampler's process_count>1 path (sharded streams, replicated
    # notes) engages — without this every pod host silently generates
    # independently on its local chips (review r5 finding; train_main has
    # had the same call since r3).
    maybe_init_distributed()
    cfg = default_config()
    if args.quantize_volume:
        cfg = cfg.replace(gen_volume_quantize=True)
    if args.keras2_gates:
        cfg = cfg.replace(lstm_recurrent_activation="hard_sigmoid")
    model = DeepJ(cfg)
    if args.from_keras:
        from music_generator_tpu.training.keras_import import (
            load_keras_weights)
        params = load_keras_weights(args.from_keras, cfg)
        print(f"Loaded Keras weights from {args.from_keras}")
    else:
        params, _ = build_or_load(model)

    # Default: one generation per genre's uniform composer mixture;
    # --styles: a single mean-of-one-hots mixture (ref: generate.py:144-148);
    # --sweep: N parallel generations interpolating two styles' weights.
    styles = [compute_genre(i, cfg) for i in range(len(cfg.genres))]
    if args.styles:
        styles = [np.mean([one_hot(i, cfg.num_styles) for i in args.styles],
                          axis=0)]
    elif args.sweep:
        a, b, n = args.sweep
        sa, sb = one_hot(a, cfg.num_styles), one_hot(b, cfg.num_styles)
        ws = np.linspace(0.0, 1.0, max(2, n))
        styles = [(1 - w) * sa + w * sb for w in ws]

    print("Generating with styles:", [int(np.argmax(s)) for s in styles])
    # More than one chip: shard the generation batch over a data mesh (the
    # sampler pads non-dividing batches; BASELINE config 4 from the stock
    # CLI).  One chip: plain single-device generation.
    from music_generator_tpu.parallel.mesh import auto_mesh
    mesh = auto_mesh()
    if mesh is not None:
        import jax
        print(f"Sharding {len(styles)} generations over "
              f"{len(jax.devices())} devices")
    sampler = Sampler(model, params, default_temp=args.temperature,
                      mesh=mesh)

    prime = None
    if args.prime:
        from music_generator_tpu.data.dataset import decode_prime
        try:
            prime = decode_prime(args.prime, args.prime_bars, config=cfg)
        except ValueError as e:
            raise SystemExit(f"--prime {args.prime}: {e}")
        print(f"Priming with {prime.shape[0]} steps "
              f"({prime.shape[0] / cfg.notes_per_bar:g} bars) "
              f"from {args.prime}")

    result = sampler.generate(styles, num_bars=args.bars, seed=args.seed,
                              prime=prime)
    if prime is not None and not args.continuation_only:
        # Write the full piece: the (clamped) prime followed by the
        # generated continuation, for every stream.
        from music_generator_tpu.generation.sampler import prepend_prime
        result = type(result)(notes=prepend_prime(result.notes, prime),
                              styles=result.styles)
    write_file(args.out, result, cfg)


def analyze_main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Corpus statistics (note/length distributions, "
                    "autocorrelation) — the working rebuild of the "
                    "reference's distribution.py.")
    parser.parse_args(argv)
    from music_generator_tpu.data.analysis import analyze_corpus
    cfg = default_config()
    stats = analyze_corpus(cfg.styles, cfg)
    import json
    print(json.dumps(stats, indent=2))


def visualize_main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Exports style embeddings for projector.tensorflow.org.")
    parser.add_argument("--from-keras", type=str, default=None,
                        metavar="MODEL_H5",
                        help="Visualize a reference (Keras 2) model.h5's "
                             "style embeddings instead of this framework's "
                             "checkpoint — a migrating user gets their TSVs "
                             "without converting anything first")
    args = parser.parse_args(argv)

    cfg = default_config()
    model = DeepJ(cfg)
    if args.from_keras:
        from music_generator_tpu.training.keras_import import (
            load_keras_weights)
        params = load_keras_weights(args.from_keras, cfg)
        print(f"Loaded Keras weights from {args.from_keras}")
    else:
        params, _ = build_or_load(model)

    # Run the shared 'style' embedding layer on the identity over all styles
    # (ref: visualize.py:16-23) — a single jnp matmul here.
    all_styles = np.identity(cfg.num_styles, dtype=np.float32)
    embedding = np.asarray(model.style_embedding(params, all_styles))

    os.makedirs(cfg.out_dir, exist_ok=True)
    vec_path = os.path.join(cfg.out_dir, "style_embedding_vec.tsv")
    np.savetxt(vec_path, embedding, delimiter="\t")

    # Labels TSV: genre + artist columns with header (ref: visualize.py:26-43).
    labels = [[g] * len(cfg.styles[i]) for i, g in enumerate(cfg.genres)]
    labels = [y for x in labels for y in x]
    style_labels = [os.path.basename(y) for x in cfg.styles for y in x]
    rows = [["Genre", "Artist"]] + list(map(list, zip(labels, style_labels)))
    label_path = os.path.join(cfg.out_dir, "style_embedding_labels.tsv")
    with open(label_path, "w") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")
    print("Wrote", vec_path, "and", label_path)
