#!/usr/bin/env python
"""Export this framework's trained checkpoint as a reference-compatible
Keras 2 weights HDF5 (`out/model.h5`) — the reverse migration path.

Run from the training working directory (where out/model.ckpt lives):
  python tools/export_keras.py --out model.h5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="model.h5")
    args = parser.parse_args(argv)

    from music_generator_tpu.config import default_config
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.checkpoint import build_or_load
    from music_generator_tpu.training.keras_import import save_keras_weights

    cfg = default_config()
    params, loaded = build_or_load(DeepJ(cfg))
    if not loaded:
        raise SystemExit("no checkpoint found (out/model.ckpt)")
    save_keras_weights(params, args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
