"""External-Keras oracle tests (tools/keras_oracle.py).

TensorFlow 2.21 / Keras 3.13 ARE importable in this image (CPU), so the
interop chain gets a real external check in CI: the reference graph
rebuilt in actual Keras must flatten to REFERENCE_LAYER_TABLE's order,
Keras's legacy positional h5 loader must accept our export, and the
real-Keras forward must match this framework's JAX forward on the
committed flagship weights.  Slow (TF import + functional build ~1 min).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

from tools.keras_oracle import (  # noqa: E402
    build_reference_model,
    load_by_name,
    load_positional_legacy,
    weighted_layer_order,
)

H5 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "artifacts", "trained_model_r4", "model.h5")


@pytest.fixture(scope="module")
def keras_model():
    return build_reference_model(time_steps=4)


def test_real_keras_layer_order_matches_table(keras_model):
    """Keras's own Functional topological sort of the transcribed
    reference graph reproduces REFERENCE_LAYER_TABLE's weighted order —
    the external confirmation of the in-repo derivational oracle
    (tests/keras_graph_oracle.py)."""
    from music_generator_tpu.training.keras_import import (
        REFERENCE_LAYER_TABLE,
    )
    want = [name for name, kind in REFERENCE_LAYER_TABLE if kind]
    assert weighted_layer_order(keras_model) == want


def test_legacy_positional_load_accepts_export(keras_model):
    """Keras's legacy h5 loader (the lineal descendant of Keras 2's
    load_weights_from_hdf5_group, which the reference's positional
    model.load_weights used — ref: util.py:19) accepts the committed
    flagship export."""
    load_positional_legacy(keras_model, H5)


def test_real_keras_forward_matches_jax(keras_model):
    """End-to-end numeric parity on the committed flagship weights: gate
    order, kernel/recurrent layouts, conv padding, style wiring,
    shift-chosen conditioning, and heads — against real Keras, not our own
    reading of it."""
    import jax

    from music_generator_tpu.config import default_config
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.keras_import import load_keras_weights

    load_by_name(keras_model, H5)
    cfg = default_config().replace(lstm_kernel="xla",
                                   compute_dtype="float32")
    T, B, N = 4, 2, cfg.num_notes
    rng = np.random.default_rng(1)
    notes = (rng.random((B, T, N, 3)) < 0.2).astype(np.float32)
    beat = np.eye(cfg.notes_per_bar, dtype=np.float32)[
        np.arange(T) % cfg.notes_per_bar][None].repeat(B, axis=0)
    style = np.zeros((B, T, cfg.num_styles), np.float32)
    style[..., 2] = 1.0

    keras_out = np.asarray(keras_model([notes, notes, beat, style],
                                       training=False))
    params = load_keras_weights(H5, cfg)
    with jax.default_matmul_precision("highest"):
        jax_out = np.asarray(DeepJ(cfg).forward(params, notes, notes, beat,
                                                style))
    np.testing.assert_allclose(keras_out, jax_out, atol=5e-5)


def test_real_tf_autodiff_gradient_parity(keras_model):
    """Backward-path oracle: d/dtheta mean(forward * W) by real TF
    autodiff vs jax.grad, on the committed flagship weights.  (A smooth
    functional, not the clipped BCE — near the 1e-7 clip d2L/dp2 ~ 1/p^2
    turns float-level forward drift into percent-level gradient drift on
    both frameworks equally; the masking semantics are numpy-oracle
    tests' job.)"""
    import jax
    import jax.numpy as jnp

    from music_generator_tpu.config import default_config
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.keras_import import load_keras_weights

    load_by_name(keras_model, H5)
    cfg = default_config().replace(lstm_kernel="xla",
                                   compute_dtype="float32")
    T, B, N = 4, 2, cfg.num_notes
    rng = np.random.default_rng(7)
    notes = (rng.random((B, T, N, 3)) < 0.2).astype(np.float32)
    beat = np.eye(cfg.notes_per_bar, dtype=np.float32)[
        np.arange(T) % cfg.notes_per_bar][None].repeat(B, axis=0)
    style = np.zeros((B, T, cfg.num_styles), np.float32)
    style[..., 5] = 1.0
    W = rng.standard_normal((B, T, N, 3)).astype(np.float32)

    with tf.GradientTape() as tape:
        out = keras_model([notes, notes, beat, style], training=False)
        fn = tf.reduce_mean(out * W)
    kgrads = tape.gradient(fn, keras_model.trainable_variables)
    kg = {v.path: np.asarray(g)
          for v, g in zip(keras_model.trainable_variables, kgrads)}

    params = load_keras_weights(H5, cfg)
    model = DeepJ(cfg)
    with jax.default_matmul_precision("highest"):
        jg = jax.grad(lambda p: jnp.mean(
            model.forward(p, notes, notes, beat, style) * W))(params)

    # Spot-check tensors across the graph depth (full 28-tensor sweep is
    # tools/keras_oracle.py's job).
    checks = [
        ("style/kernel", jg.style_embed.kernel),
        ("conv1d_1/kernel", jg.conv.kernel),
        ("lstm_1/lstm_cell/recurrent_kernel", jg.time_axis[0].lstm.recurrent),
        ("lstm_4/lstm_cell/kernel", jg.note_axis[1].lstm.kernel),
        ("volume_dense/kernel", jg.volume_dense.kernel),
    ]
    for suffix, jleaf in checks:
        karr = next(v for k, v in kg.items() if k.endswith(suffix))
        jarr = np.asarray(jleaf)
        cos = float(np.dot(karr.ravel(), jarr.ravel())
                    / (np.linalg.norm(karr) * np.linalg.norm(jarr) + 1e-30))
        assert cos > 0.99999, (suffix, cos)
