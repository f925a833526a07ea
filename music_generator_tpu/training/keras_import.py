"""Import/export reference (Keras 2 HDF5) checkpoints.

The reference trains with Keras and checkpoints weights-only HDF5 to
`out/model.h5` (ref: train.py:23, constants.py:82).  A user migrating from
the reference brings such a file; this module maps it onto the framework's
params pytree so their trained model keeps working.

Keras 2 `save_weights` layout: root attrs `layer_names` (build order) and
per-layer groups whose `weight_names` attr lists dataset paths like
`b"lstm_1/lstm_1/kernel:0"`.  The reference's graph builds layers in a
fixed order (ref: model.py:51-169):

  conv1d                      → params.conv                 [W, in, out] + b
  dense_*  (time l0, time l1) → time_axis[l].style_proj     (in build order)
  lstm_*   (time l0, time l1) → time_axis[l].lstm
  dense_*  (note l0, note l1) → note_axis[l].style_proj
  lstm_*   (note l0, note l1) → note_axis[l].lstm
  note_dense / volume_dense   → the output heads (explicitly named,
                                ref: model.py:94-95)
  style                       → params.style_embed (explicitly named,
                                ref: model.py:141)

Keras LSTM gate order is i, f, c(g), o — identical to ops/pallas_lstm's
`_gate_slices` — and kernels are stored [in, 4H] / recurrent [H, 4H], so
weights drop in without transposes.
"""

from __future__ import annotations

from typing import List

import numpy as np

from music_generator_tpu.config import Config
from music_generator_tpu.models.deepj import (
    AxisLayer,
    Conv1D,
    Dense,
    Params,
)
from music_generator_tpu.ops.lstm import LSTMParams


def _decode(names) -> List[str]:
    return [n.decode() if isinstance(n, bytes) else str(n) for n in names]


def _layer_weights(group) -> List[np.ndarray]:
    names = _decode(group.attrs["weight_names"])
    return [np.asarray(group[n]) for n in names]


def save_keras_weights(params: Params, path: str) -> None:
    """Write Params as a reference-compatible Keras 2 weights HDF5
    (the inverse of load_keras_weights): a model trained HERE can be taken
    back to the reference codebase's `out/model.h5`."""
    import h5py

    with h5py.File(path, "w") as f:
        layers = []

        def put(layer: str, names, arrays) -> None:
            g = f.create_group(layer)
            g.attrs["weight_names"] = np.array(
                [f"{layer}/{n}:0".encode() for n in names])
            for n, a in zip(names, arrays):
                g.create_dataset(f"{layer}/{n}:0",
                                 data=np.asarray(a, np.float32))
            layers.append(layer.encode())

        put("conv1d", ["kernel", "bias"],
            [params.conv.kernel, params.conv.bias])
        for l, t in enumerate(params.time_axis):
            put(f"dense_{l + 1}", ["kernel", "bias"],
                [t.style_proj.kernel, t.style_proj.bias])
            put(f"lstm_{l + 1}", ["kernel", "recurrent_kernel", "bias"],
                [t.lstm.kernel, t.lstm.recurrent, t.lstm.bias])
        off = len(params.time_axis)
        for l, nt in enumerate(params.note_axis):
            put(f"dense_{off + l + 1}", ["kernel", "bias"],
                [nt.style_proj.kernel, nt.style_proj.bias])
            put(f"lstm_{off + l + 1}", ["kernel", "recurrent_kernel", "bias"],
                [nt.lstm.kernel, nt.lstm.recurrent, nt.lstm.bias])
        put("note_dense", ["kernel", "bias"],
            [params.note_dense.kernel, params.note_dense.bias])
        put("volume_dense", ["kernel", "bias"],
            [params.volume_dense.kernel, params.volume_dense.bias])
        put("style", ["kernel", "bias"],
            [params.style_embed.kernel, params.style_embed.bias])
        f.attrs["layer_names"] = np.array(layers)
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.1.6"


def load_keras_weights(path: str, cfg: Config) -> Params:
    """Read a reference `model.h5` (Keras 2 weights-only HDF5) into Params.

    Raises ValueError when the file's layer inventory doesn't match the
    DeepJ architecture for `cfg` (wrong dims fail loudly, not silently).
    """
    import h5py

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = _decode(root.attrs["layer_names"])

        convs, denses, lstms = [], [], []
        named = {}
        for name in layer_names:
            group = root[name]
            weights = _layer_weights(group)
            if not weights:
                continue                      # Input/Dropout/Lambda layers
            if name in ("style", "note_dense", "volume_dense"):
                named[name] = weights
            elif name.startswith("conv1d"):
                convs.append(weights)
            elif name.startswith("dense"):
                denses.append(weights)
            elif name.startswith("lstm"):
                lstms.append(weights)

        missing = {"style", "note_dense", "volume_dense"} - set(named)
        if missing or len(convs) != 1 or len(denses) != 4 or len(lstms) != 4:
            raise ValueError(
                f"not a DeepJ Keras checkpoint: missing={sorted(missing)}, "
                f"conv1d={len(convs)}, dense={len(denses)}, "
                f"lstm={len(lstms)} (want 1/4/4)")

        def dense(w, in_dim, out_dim, what) -> Dense:
            kernel, bias = w
            if kernel.shape != (in_dim, out_dim):
                raise ValueError(f"{what}: kernel {kernel.shape} != "
                                 f"{(in_dim, out_dim)} for this config")
            return Dense(np.asarray(kernel, np.float32),
                         np.asarray(bias, np.float32))

        def lstm(w, in_dim, units, what) -> LSTMParams:
            kernel, recurrent, bias = w
            if kernel.shape != (in_dim, 4 * units):
                raise ValueError(f"{what}: kernel {kernel.shape} != "
                                 f"{(in_dim, 4 * units)} for this config")
            return LSTMParams(np.asarray(kernel, np.float32),
                              np.asarray(recurrent, np.float32),
                              np.asarray(bias, np.float32))

        from music_generator_tpu.models.deepj import feature_dim
        f_dim = feature_dim(cfg)
        time_in = [f_dim, cfg.time_axis_units]
        note_in = [cfg.time_axis_units + cfg.note_units, cfg.note_axis_units]

        time_axis = tuple(
            AxisLayer(
                style_proj=dense(denses[l], cfg.style_units, time_in[l],
                                 f"time style_proj[{l}]"),
                lstm=lstm(lstms[l], time_in[l], cfg.time_axis_units,
                          f"time lstm[{l}]"))
            for l in range(2))
        note_axis = tuple(
            AxisLayer(
                style_proj=dense(denses[2 + l], cfg.style_units, note_in[l],
                                 f"note style_proj[{l}]"),
                lstm=lstm(lstms[2 + l], note_in[l], cfg.note_axis_units,
                          f"note lstm[{l}]"))
            for l in range(2))

        conv_k, conv_b = convs[0]
        if conv_k.shape != (2 * cfg.octave, cfg.note_units, cfg.octave_units):
            raise ValueError(f"conv1d kernel {conv_k.shape} != "
                             f"{(2 * cfg.octave, cfg.note_units, cfg.octave_units)}")

        return Params(
            style_embed=dense(named["style"], cfg.num_styles,
                              cfg.style_units, "style"),
            conv=Conv1D(np.asarray(conv_k, np.float32),
                        np.asarray(conv_b, np.float32)),
            time_axis=time_axis,
            note_axis=note_axis,
            note_dense=dense(named["note_dense"], cfg.note_axis_units, 2,
                             "note_dense"),
            volume_dense=dense(named["volume_dense"], cfg.note_axis_units, 1,
                               "volume_dense"),
        )
