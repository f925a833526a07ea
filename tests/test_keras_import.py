"""Keras 2 HDF5 weight import (the migration path for users of the
reference): build a weights file in the exact `save_weights` layout the
reference produces (root `layer_names` attr in graph-build order, per-layer
`weight_names` attrs — ref: train.py:23 ModelCheckpoint save_weights_only),
import it, and verify values land on the right params leaves."""

import numpy as np
import pytest

import jax

from music_generator_tpu.config import test_config as make_test_config
from music_generator_tpu.models.deepj import DeepJ, feature_dim, init_params
from music_generator_tpu.training.keras_import import load_keras_weights

h5py = pytest.importorskip("h5py")

CFG = make_test_config()


def _write_keras_h5(path, params, cfg):
    """Emulate Keras 2 save_weights for the reference's build order
    (ref: model.py:51-169): conv1d, then per time layer (dense, lstm), per
    note layer (dense, lstm), the named heads, and the named 'style'
    embedding — interleaved with weightless layers (Dropout/Lambda) that
    Keras also lists."""
    def put(f, layer, names, arrays):
        g = f.create_group(layer)
        g.attrs["weight_names"] = np.array(
            [f"{layer}/{n}:0".encode() for n in names])
        for n, a in zip(names, arrays):
            g.create_dataset(f"{layer}/{n}:0", data=np.asarray(a))

    with h5py.File(path, "w") as f:
        layers = []

        def add(layer, names=(), arrays=()):
            put(f, layer, names, arrays)
            layers.append(layer.encode())

        add("input_1")                                     # weightless
        add("conv1d", ["kernel", "bias"],
            [params.conv.kernel, params.conv.bias])
        add("dropout_1")
        for l, t in enumerate(params.time_axis):
            add(f"dense_{l + 1}", ["kernel", "bias"],
                [t.style_proj.kernel, t.style_proj.bias])
            add(f"lstm_{l + 1}", ["kernel", "recurrent_kernel", "bias"],
                [t.lstm.kernel, t.lstm.recurrent, t.lstm.bias])
        for l, nt in enumerate(params.note_axis):
            add(f"dense_{l + 3}", ["kernel", "bias"],
                [nt.style_proj.kernel, nt.style_proj.bias])
            add(f"lstm_{l + 3}", ["kernel", "recurrent_kernel", "bias"],
                [nt.lstm.kernel, nt.lstm.recurrent, nt.lstm.bias])
        add("note_dense", ["kernel", "bias"],
            [params.note_dense.kernel, params.note_dense.bias])
        add("volume_dense", ["kernel", "bias"],
            [params.volume_dense.kernel, params.volume_dense.bias])
        add("style", ["kernel", "bias"],
            [params.style_embed.kernel, params.style_embed.bias])
        f.attrs["layer_names"] = np.array(layers)
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.1.0"


def test_import_roundtrip_and_forward_parity(tmp_path):
    src = init_params(jax.random.key(7), CFG)
    path = str(tmp_path / "model.h5")
    _write_keras_h5(path, src, CFG)

    imported = load_keras_weights(path, CFG)
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(imported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The imported params drive the model identically.
    model = DeepJ(CFG)
    B, T, N = 2, CFG.seq_len, CFG.num_notes
    notes = np.zeros((B, T, N, 3), np.float32)
    notes[:, ::2, 10, 0] = 1.0
    beat = np.eye(CFG.notes_per_bar, dtype=np.float32)[
        np.arange(T) % CFG.notes_per_bar][None].repeat(B, 0)
    style = np.zeros((B, T, CFG.num_styles), np.float32)
    style[..., 0] = 1
    ref = model.forward(src, notes, notes, beat, style)
    got = model.forward(imported, notes, notes, beat, style)
    # numpy-typed vs jax-typed param leaves can fuse slightly differently
    # under jit — ULP-level only.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_import_rejects_wrong_architecture(tmp_path):
    src = init_params(jax.random.key(1), CFG)
    path = str(tmp_path / "model.h5")
    _write_keras_h5(path, src, CFG)
    # A config with different dims must fail loudly, not import garbage.
    bad_cfg = make_test_config(time_axis_units=32)
    with pytest.raises(ValueError, match="kernel"):
        load_keras_weights(path, bad_cfg)

    # A file missing the named layers is rejected.
    with h5py.File(path, "a") as f:
        names = [n for n in f.attrs["layer_names"] if n != b"style"]
        f.attrs["layer_names"] = np.array(names)
    with pytest.raises(ValueError, match="style"):
        load_keras_weights(path, CFG)


def test_import_supports_model_weights_subgroup(tmp_path):
    """Files saved via Keras `save_model` nest everything under a
    'model_weights' group — the importer handles both layouts."""
    src = init_params(jax.random.key(2), CFG)
    inner = str(tmp_path / "flat.h5")
    _write_keras_h5(inner, src, CFG)
    outer = str(tmp_path / "full.h5")
    with h5py.File(inner, "r") as fin, h5py.File(outer, "w") as fout:
        g = fout.create_group("model_weights")
        for k in fin:
            fin.copy(k, g)
        for a, v in fin.attrs.items():
            g.attrs[a] = v
    imported = load_keras_weights(outer, CFG)
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(imported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_import_roundtrip(tmp_path):
    """save_keras_weights -> load_keras_weights is leaf-exact (the reverse
    migration path: take a model trained here back to the reference)."""
    from music_generator_tpu.training.keras_import import save_keras_weights
    src = init_params(jax.random.key(11), CFG)
    path = str(tmp_path / "exported.h5")
    save_keras_weights(src, path)
    back = load_keras_weights(path, CFG)
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
