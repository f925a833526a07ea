#!/usr/bin/env python
"""External Keras oracle for the reference-interop chain.

This image DOES carry TensorFlow 2.21 / Keras 3.13 (CPU — a fact earlier
rounds missed), so the two interop claims that previously rested on the
in-repo derivational oracle (tests/keras_graph_oracle.py) get a genuinely
EXTERNAL check here:

1. **Order oracle** — the reference training graph (ref: model.py:128-151,
   time_axis :51-89, note_axis :91-126) is rebuilt layer-for-layer in real
   Keras with every layer explicitly carrying its Keras-2 auto-name, and
   Keras's own Functional-model topological sort must flatten it to
   exactly `REFERENCE_LAYER_TABLE`'s order; then Keras's LEGACY positional
   h5 loader (`keras.src.legacy.saving.legacy_h5_format`, the lineal
   descendant of Keras 2's `load_weights_from_hdf5_group`) must accept our
   `save_keras_weights` export positionally — the executable stand-in for
   the reference's `model.load_weights` (ref: util.py:19).

2. **Numeric oracle** — with our exported flagship weights loaded, the
   real-Keras forward pass must match this framework's JAX forward to
   float tolerance.  That validates end-to-end: LSTM gate order (i,f,g,o),
   kernel/recurrent layouts, Conv1D layout, the style-projection wiring,
   shift-chosen conditioning, and the output heads — against an
   independent implementation, not our own reading of Keras.

Variants quantify the two places the rebuild knowingly differs:
  --chroma reference-bug   transcribes the reference's scrambled
                           pitch_bins_f reshape (deviation #1) instead of
                           the fixed intent, measuring the bug's effect on
                           a trained checkpoint's outputs;
  hard_sigmoid gates       the Keras 2.1.x-era LSTM default (the
                           unversioned 2018 requirements.txt almost
                           certainly resolved to it): clip(0.2x+0.5, 0, 1)
                           — NOTE Keras 3 redefined `hard_sigmoid` to
                           x/6+0.5, so the variant passes the Keras 2
                           formula as a custom callable.  The rebuild
                           defaults to exact sigmoid (deviation #12,
                           measured here); Config(lstm_recurrent_activation
                           ="hard_sigmoid") runs imported Keras-2 weights
                           with their original gate math, validated against
                           the real-Keras variant below.

Run from /root/repo (CPU; TF is CPU-only in this image):
  python tools/keras_oracle.py [--params artifacts/trained_model_r4/model.h5]
Writes artifacts/keras_oracle_r4/REPORT.json unless --no-artifact.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_H5 = os.path.join(REPO, "artifacts", "trained_model_r4", "model.h5")


def build_reference_model(time_steps: int = 8, chroma: str = "fixed",
                          recurrent_activation="sigmoid",
                          input_dropout: float = 0.2, dropout: float = 0.5):
    """The reference training graph in real Keras, creation order and all
    layer names matching Keras 2's auto-naming of ref model.py exactly.

    recurrent_activation: "sigmoid", or "keras2_hard_sigmoid" for the
    reference era's default (passed as a custom callable — Keras 3's
    built-in "hard_sigmoid" is a DIFFERENT function, x/6+0.5)."""
    import tensorflow as tf
    from keras import Model
    from keras import layers as L

    if recurrent_activation == "keras2_hard_sigmoid":
        recurrent_activation = (
            lambda x: tf.clip_by_value(0.2 * x + 0.5, 0.0, 1.0))

    from music_generator_tpu.config import default_config

    cfg = default_config()
    N, O, NO = cfg.num_notes, cfg.octave, cfg.num_octaves
    T = time_steps

    def pitch_pos(x):                          # ref: model.py:22-30
        r = tf.range(N, dtype="float32") / N
        return tf.broadcast_to(r[None, None, :, None],
                               [tf.shape(x)[0], T, N, 1])

    def pitch_class(x):                        # ref: model.py:32-41
        m = tf.one_hot(tf.range(N) % O, O)
        return tf.broadcast_to(m[None, None], [tf.shape(x)[0], T, N, O])

    def chroma_fixed(x):
        # The documented intent (deviation #1): per-pitch-class play mass,
        # seen by every note of that class.
        play = x[..., 0]                                     # [B, T, N]
        bins = tf.reduce_sum(
            tf.reshape(play, [tf.shape(x)[0], T, NO, O]), axis=2)
        return tf.tile(bins, [1, 1, NO])[..., None]

    def chroma_reference_bug(x):
        # Verbatim semantics of ref model.py:43-49: the list-stack /
        # reduce / tile / reshape scrambles batch, time and pitch.
        bins = tf.reduce_sum([x[:, :, i::O, 0] for i in range(O)], axis=3)
        bins = tf.tile(bins, [NO, 1, 1])
        return tf.reshape(bins, [tf.shape(x)[0], T, N, 1])

    def shift_chosen(x):                       # ref: model.py:101
        return tf.pad(x[:, :, :-1, :], [[0, 0], [0, 0], [1, 0], [0, 0]])

    chroma_fn = {"fixed": chroma_fixed,
                 "reference-bug": chroma_reference_bug}[chroma]

    notes_in = L.Input((T, N, cfg.note_units), name="input_1")
    beat_in = L.Input((T, cfg.notes_per_bar), name="input_2")
    style_in = L.Input((T, cfg.num_styles), name="input_3")
    chosen_in = L.Input((T, N, cfg.note_units), name="input_4")

    notes = L.Dropout(input_dropout, name="dropout_1")(notes_in)
    beat = L.Dropout(input_dropout, name="dropout_2")(beat_in)
    chosen = L.Dropout(input_dropout, name="dropout_3")(chosen_in)
    style = L.Dense(cfg.style_units, name="style")(style_in)

    # --- time axis (ref: model.py:51-89) ---------------------------------
    conv = L.TimeDistributed(
        L.Conv1D(cfg.octave_units, 2 * O, padding="same", name="conv1d_1"),
        name="time_distributed_1")(notes)
    conv = L.Activation("tanh", name="activation_1")(conv)
    conv = L.Dropout(dropout, name="dropout_4")(conv)

    feats = L.Concatenate(name="concatenate_1")([
        L.Lambda(pitch_pos, output_shape=(T, N, 1), name="lambda_1")(notes),
        L.Lambda(pitch_class, output_shape=(T, N, O), name="lambda_2")(notes),
        L.Lambda(chroma_fn, output_shape=(T, N, 1), name="lambda_3")(notes),
        conv,
        L.TimeDistributed(L.RepeatVector(N), name="time_distributed_2")(beat),
    ])
    x = L.Permute((2, 1, 3), name="permute_1")(feats)

    uid = {"dense": 0, "td": 2, "act": 1, "drop": 4, "perm": 1, "add": 0,
           "lstm": 0}

    def n(kind):
        uid[kind] += 1
        prefix = {"dense": "dense", "td": "time_distributed",
                  "act": "activation", "drop": "dropout", "perm": "permute",
                  "add": "add", "lstm": "lstm"}[kind]
        return f"{prefix}_{uid[kind]}"

    for _ in range(cfg.time_axis_layers):
        sp = L.Dense(int(x.shape[3]), name=n("dense"))(style)
        sp = L.TimeDistributed(L.RepeatVector(N), name=n("td"))(sp)
        sp = L.Activation("tanh", name=n("act"))(sp)
        sp = L.Dropout(dropout, name=n("drop"))(sp)
        sp = L.Permute((2, 1, 3), name=n("perm"))(sp)
        x = L.Add(name=n("add"))([x, sp])
        x = L.TimeDistributed(
            L.LSTM(cfg.time_axis_units, return_sequences=True,
                   recurrent_activation=recurrent_activation,
                   name=n("lstm")), name=n("td"))(x)
        x = L.Dropout(dropout, name=n("drop"))(x)
    x = L.Permute((2, 1, 3), name=n("perm"))(x)

    # --- note axis (ref: model.py:91-126) --------------------------------
    note_dense = L.Dense(2, activation="sigmoid", name="note_dense")
    volume_dense = L.Dense(1, name="volume_dense")

    sc = L.Lambda(shift_chosen, output_shape=(T, N, cfg.note_units),
                  name="lambda_4")(chosen)
    sc = L.Reshape((T, N, -1), name="reshape_1")(sc)
    x = L.Concatenate(axis=3, name="concatenate_2")([x, sc])

    for _ in range(cfg.note_axis_layers):
        sp = L.Dense(int(x.shape[3]), name=n("dense"))(style)
        sp = L.TimeDistributed(L.RepeatVector(N), name=n("td"))(sp)
        sp = L.Activation("tanh", name=n("act"))(sp)
        sp = L.Dropout(dropout, name=n("drop"))(sp)
        x = L.Add(name=n("add"))([x, sp])
        x = L.TimeDistributed(
            L.LSTM(cfg.note_axis_units, return_sequences=True,
                   recurrent_activation=recurrent_activation,
                   name=n("lstm")), name=n("td"))(x)
        x = L.Dropout(dropout, name=n("drop"))(x)

    out = L.Concatenate(name="concatenate_3")([note_dense(x),
                                               volume_dense(x)])
    return Model([notes_in, chosen_in, beat_in, style_in], out)


def weighted_layer_order(model):
    return [l.name for l in model.layers if l.weights]


def load_by_name(model, h5_path: str):
    """Assign our export's arrays to the named layers directly (order-free
    — isolates the numeric oracle from the order oracle)."""
    import h5py
    with h5py.File(h5_path, "r") as f:
        for layer in model.layers:
            if not layer.weights:
                continue
            g = f[layer.name]
            names = [x.decode() if isinstance(x, bytes) else str(x)
                     for x in g.attrs["weight_names"]]
            layer.set_weights([g[x][()] for x in names])


def load_positional_legacy(model, h5_path: str):
    """Keras's legacy topological h5 loader — the executable stand-in for
    the reference's positional `model.load_weights` (ref: util.py:19)."""
    import h5py
    from keras.src.legacy.saving import legacy_h5_format
    with h5py.File(h5_path, "r") as f:
        legacy_h5_format.load_weights_from_hdf5_group(f, model)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", default=DEFAULT_H5,
                        help="reference-layout weights h5 "
                             "(save_keras_weights output)")
    parser.add_argument("--time-steps", type=int, default=8)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "keras_oracle_r4"))
    parser.add_argument("--no-artifact", action="store_true")
    args = parser.parse_args(argv)

    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.training.keras_import import (
        REFERENCE_LAYER_TABLE,
        load_keras_weights,
    )

    cfg = default_config().replace(lstm_kernel="xla",
                                   compute_dtype="float32")
    T, B = args.time_steps, args.batch
    report = {"h5": os.path.relpath(args.params, REPO),
              "time_steps": T, "batch": B}

    # --- 1. order oracle -------------------------------------------------
    model = build_reference_model(T)
    got = weighted_layer_order(model)
    want = [name for name, kind in REFERENCE_LAYER_TABLE if kind]
    report["keras_weighted_layer_order"] = got
    report["table_weighted_layer_order"] = want
    report["order_matches_table"] = got == want
    print("Keras weighted-layer order matches REFERENCE_LAYER_TABLE:",
          got == want)
    assert got == want, (got, want)

    # Positional legacy load must accept the export.
    load_positional_legacy(model, args.params)
    print("legacy positional load_weights: OK")
    report["legacy_positional_load"] = "ok"

    # --- 2. numeric oracle ----------------------------------------------
    rng = np.random.default_rng(0)
    notes = (rng.random((B, T, cfg.num_notes, 3)) < 0.2).astype(np.float32)
    notes[..., 2] *= rng.random((B, T, cfg.num_notes)).astype(np.float32)
    notes[..., 0] = (notes[..., 2] > 0).astype(np.float32)
    chosen = notes
    beat = np.eye(cfg.notes_per_bar, dtype=np.float32)[
        np.arange(T) % cfg.notes_per_bar][None].repeat(B, axis=0)
    style = np.zeros((B, T, cfg.num_styles), np.float32)
    style[..., 0] = 1.0

    keras_out = np.asarray(model([notes, chosen, beat, style],
                                 training=False))

    import jax

    from music_generator_tpu.models.deepj import DeepJ
    jmodel = DeepJ(cfg)
    params = load_keras_weights(args.params, cfg)
    with jax.default_matmul_precision("highest"):
        jax_out = np.asarray(jmodel.forward(params, notes, chosen, beat,
                                            style))
    d = float(np.max(np.abs(keras_out - jax_out)))
    print(f"forward max|keras - jax| = {d:.3e} "
          f"(sigmoid gates, fixed chroma)")
    report["forward_maxdiff_sigmoid_fixed_chroma"] = d
    assert d < 5e-5, d

    # --- 3. measured deviations ------------------------------------------
    variants = {}
    for tag, kwargs in (
            ("hard_sigmoid_gates",
             {"recurrent_activation": "keras2_hard_sigmoid"}),
            ("reference_bug_chroma", {"chroma": "reference-bug"})):
        variant = build_reference_model(T, **kwargs)
        load_by_name(variant, args.params)
        vout = np.asarray(variant([notes, chosen, beat, style],
                                  training=False))
        variants[tag] = vout
        dv = float(np.max(np.abs(vout - jax_out)))
        dm = float(np.mean(np.abs(vout - jax_out)))
        print(f"forward |keras[{tag}] - jax|: max={dv:.3e} mean={dm:.3e}")
        report[f"forward_maxdiff_{tag}"] = dv
        report[f"forward_meandiff_{tag}"] = dm

    # --- 4. the compatibility mode is faithful ---------------------------
    # Config(lstm_recurrent_activation="hard_sigmoid") must reproduce the
    # REAL Keras hard_sigmoid (Keras 2 formula) forward.
    jmodel_hs = DeepJ(cfg.replace(lstm_recurrent_activation="hard_sigmoid"))
    with jax.default_matmul_precision("highest"):
        jax_hs = np.asarray(jmodel_hs.forward(params, notes, chosen, beat,
                                              style))
    dhs = float(np.max(np.abs(variants["hard_sigmoid_gates"] - jax_hs)))
    print(f"forward max|keras[hard_sigmoid] - jax[hard_sigmoid]| = "
          f"{dhs:.3e} (the deviation-#12 compatibility mode)")
    report["forward_maxdiff_hard_sigmoid_compat_mode"] = dhs
    assert dhs < 5e-5, dhs

    # --- 5. loss + full gradient oracle ----------------------------------
    # The reference's primary_loss (ref: model.py:14-20) computed with real
    # keras.losses on the real-Keras forward, differentiated by real TF
    # autodiff, vs our masked loss + jax.grad — the external check of the
    # subtle masking semantics AND the whole backward pass.
    import tensorflow as tf
    from keras import losses as klosses

    targets = (rng.random((B, T, cfg.num_notes, 3)) < 0.25).astype(
        np.float32)
    targets[..., 2] *= rng.random((B, T, cfg.num_notes)).astype(np.float32)
    targets[..., 0] = (targets[..., 2] > 0).astype(np.float32)

    # 5a. Loss-value parity: the reference's formula with real
    # keras.losses on the real-Keras forward vs our masked loss.
    tt = tf.constant(targets)
    pred = model([notes, targets, beat, style], training=False)
    played = tt[..., 0]
    bce_note = klosses.binary_crossentropy(tt[..., 0], pred[..., 0])
    bce_replay = klosses.binary_crossentropy(
        tt[..., 1], played * pred[..., 1] + (1 - played) * tt[..., 1])
    mse = klosses.mean_squared_error(
        tt[..., 2], played * pred[..., 2] + (1 - played) * tt[..., 2])
    keras_loss = tf.reduce_mean(bce_note + bce_replay + mse)

    def jax_loss(p):
        return jmodel.loss(p, (notes, targets, beat, style), rng=None,
                           train=False)[0]

    with jax.default_matmul_precision("highest"):
        jl = jax_loss(params)
    dl = abs(float(jl) - float(keras_loss)) / max(1.0, abs(float(keras_loss)))
    print(f"loss: keras={float(keras_loss):.6f} jax={float(jl):.6f} "
          f"rel-diff={dl:.3e}")
    report["loss_keras"] = float(keras_loss)
    report["loss_jax"] = float(jl)
    # Random targets against a trained model put many elements near the
    # BCE 1e-7 clip, where log() amplifies the ~3e-6 forward drift —
    # relative tolerance, not the forward pass's absolute one.  (The same
    # amplification is why the GRADIENT check below differentiates a
    # smooth functional of the forward instead of the clipped BCE: near
    # the clip, d2L/dp2 ~ 1/p^2 turns float-level forward drift into
    # percent-level gradient drift on BOTH frameworks equally — it would
    # measure the targets' clip proximity, not implementation parity.
    # The masking semantics themselves are numpy-oracle-pinned in
    # tests/test_model.py.)
    assert dl < 1e-3, dl

    # 5b. Backward-path parity: d/dtheta mean(forward * W) for a fixed
    # random W — real TF autodiff through the whole graph vs jax.grad.
    W = rng.standard_normal(pred.shape).astype(np.float32)
    with tf.GradientTape() as tape:
        p2 = model([notes, targets, beat, style], training=False)
        keras_fn = tf.reduce_mean(p2 * W)
    keras_grads = tape.gradient(keras_fn, model.trainable_variables)
    kg = {v.path if hasattr(v, "path") else v.name: np.asarray(g)
          for v, g in zip(model.trainable_variables, keras_grads)}

    import jax.numpy as jnp

    def jax_fn(p):
        out = jmodel.forward(p, notes, targets, beat, style)
        return jnp.mean(out * W)

    with jax.default_matmul_precision("highest"):
        jg = jax.grad(jax_fn)(params)

    # Pair real-Keras gradients with our Params leaves by layer name.
    pairs = [
        ("style", [jg.style_embed.kernel, jg.style_embed.bias]),
        ("conv1d_1", [jg.conv.kernel, jg.conv.bias]),
        ("dense_1", [jg.time_axis[0].style_proj.kernel,
                     jg.time_axis[0].style_proj.bias]),
        ("dense_2", [jg.time_axis[1].style_proj.kernel,
                     jg.time_axis[1].style_proj.bias]),
        ("lstm_1", [jg.time_axis[0].lstm.kernel,
                    jg.time_axis[0].lstm.recurrent,
                    jg.time_axis[0].lstm.bias]),
        ("lstm_2", [jg.time_axis[1].lstm.kernel,
                    jg.time_axis[1].lstm.recurrent,
                    jg.time_axis[1].lstm.bias]),
        ("dense_3", [jg.note_axis[0].style_proj.kernel,
                     jg.note_axis[0].style_proj.bias]),
        ("dense_4", [jg.note_axis[1].style_proj.kernel,
                     jg.note_axis[1].style_proj.bias]),
        ("lstm_3", [jg.note_axis[0].lstm.kernel,
                    jg.note_axis[0].lstm.recurrent,
                    jg.note_axis[0].lstm.bias]),
        ("lstm_4", [jg.note_axis[1].lstm.kernel,
                    jg.note_axis[1].lstm.recurrent,
                    jg.note_axis[1].lstm.bias]),
        ("note_dense", [jg.note_dense.kernel, jg.note_dense.bias]),
        ("volume_dense", [jg.volume_dense.kernel, jg.volume_dense.bias]),
    ]
    worst = (1.0, "")
    n_checked = 0
    for inner, jleaves in pairs:
        part_names = (["kernel", "bias"] if len(jleaves) == 2
                      else ["kernel", "recurrent_kernel", "bias"])
        for part, jgrad in zip(part_names, jleaves):
            jarr = np.asarray(jgrad)
            # Keras variable paths look like "lstm_1/recurrent_kernel";
            # "kernel" must not match "recurrent_kernel".
            kname = next(k for k in kg
                         if f"{inner}/" in k and k.endswith("/" + part))
            karr = kg.pop(kname)
            assert karr.shape == jarr.shape, (kname, karr.shape, jarr.shape)
            cos = float(np.dot(karr.ravel(), jarr.ravel())
                        / (np.linalg.norm(karr) * np.linalg.norm(jarr)
                           + 1e-30))
            n_checked += 1
            if cos < worst[0]:
                worst = (cos, kname)
    assert n_checked == 28, n_checked
    print(f"gradient cosine similarity (worst of 28 tensors): "
          f"{worst[0]:.8f} ({worst[1]})")
    report["grad_cosine_worst"] = worst[0]
    report["grad_cosine_worst_tensor"] = worst[1]
    assert worst[0] > 0.99999, worst

    if not args.no_artifact:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "REPORT.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", path)
    print("KERAS_ORACLE_OK")


if __name__ == "__main__":
    main()
