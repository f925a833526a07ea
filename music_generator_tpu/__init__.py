"""music_generator_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of calclavia/music-generator (DeepJ, arXiv:1801.00887).

Built from scratch, TPU-first: the biaxial LSTM runs as `lax.scan` over fused
Pallas LSTM cells, training is pjit data-parallel over a device mesh, and
generation is an on-device XLA loop carrying O(1) recurrent state.

Layer map (mirrors the reference's conceptual layers, SURVEY.md §1):
  config    — frozen dataclass of every hyperparameter (ref: constants.py)
  midi      — self-written MIDI event model, binary IO, and piano-roll codec
              (ref: midi_util.py + the vendored `midi` package)
  data      — dataset pipeline: walk/cache/clamp/window (ref: dataset.py)
  models    — the biaxial DeepJ model + masked loss (ref: model.py)
  ops       — LSTM cells/scans incl. Pallas fused kernels, sampling ops
  parallel  — mesh construction, shardings, pjit train step
  training  — train loop, checkpoint/early-stop/metrics (ref: train.py)
  generation— on-device autoregressive sampler (ref: generate.py)
  utils     — shared helpers (ref: util.py)
"""

from music_generator_tpu.config import Config, default_config

__version__ = "0.1.0"

__all__ = ["Config", "default_config", "__version__"]
