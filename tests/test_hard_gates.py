"""Keras-2 hard_sigmoid gates on the FUSED kernels (deviation #12, r5).

Before r5 the compatibility mode forced the XLA path, so reference-trained
weights forfeited the fused training speedup and the fused generation
kernel (VERDICT r4 #6).  These tests pin, in interpret mode, that every
fused family — the single-layer recurrence, the two-layer stack, both v3
biaxial stacks (forward AND custom-VJP gradients), and the generation
pitch kernel — reproduces the XLA hard-sigmoid path that
tools/keras_oracle.py certified against real Keras to 6.5e-6
(artifacts/keras_oracle_r4/REPORT.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan
from music_generator_tpu.ops.pallas_lstm2 import pallas_lstm2

HARD = "hard_sigmoid"
T, B, D, H = 5, 8, 12, 8


def test_hard_sigmoid_formula_is_keras2():
    """clip(0.2x + 0.5, 0, 1) with saturation at exactly ±2.5 — Keras 2's
    definition, not Keras 3's x/6 + 0.5."""
    from music_generator_tpu.ops.pallas_lstm import _hard_sigmoid
    x = jnp.asarray([-3.0, -2.5, -1.0, 0.0, 1.0, 2.5, 3.0])
    np.testing.assert_allclose(
        np.asarray(_hard_sigmoid(x)),
        [0.0, 0.0, 0.3, 0.5, 0.7, 1.0, 1.0], atol=1e-7)


def test_single_layer_recurrence_hard_forward_and_grads():
    from music_generator_tpu.ops.pallas_lstm import pallas_lstm_recurrence

    k = jax.random.split(jax.random.key(0), 2)
    p = lstm_init(k[0], D, H)
    xs = jax.random.normal(k[1], (T, B, D), jnp.float32)
    xw = (xs.reshape(T * B, D) @ p.kernel + p.bias).reshape(T, B, 4 * H)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    def ref(xw_):
        # lstm_scan recomputes xw internally; feed identity kernel instead.
        hs, (hT, cT) = lstm_scan(
            p._replace(kernel=jnp.eye(4 * H), bias=jnp.zeros(4 * H)),
            xw_, kernel="xla", recurrent_activation=HARD)
        return hs, hT, cT

    def fused(xw_):
        hs, (hT, cT) = pallas_lstm_recurrence(
            xw_, p.recurrent, h0, c0, recurrent_activation=HARD)
        return hs, hT, cT

    hs_ref, hT_ref, cT_ref = ref(xw)
    with pltpu.force_tpu_interpret_mode():
        hs, hT, cT = fused(xw)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_ref), atol=1e-5)

    W = jnp.arange(1, T * B * H + 1).reshape(T, B, H) * 1e-3
    g_ref = jax.grad(lambda a: jnp.sum(ref(a)[0] * W))(xw)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a: jnp.sum(fused(a)[0] * W))(xw)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_two_layer_stack_hard_forward_and_grads():
    k = jax.random.split(jax.random.key(1), 4)
    p0 = lstm_init(k[0], D, H)
    p1 = lstm_init(k[1], H, H)
    xs = jax.random.normal(k[2], (T, B, D), jnp.float32)
    s1m = 0.1 * jax.random.normal(k[3], (T, B, H), jnp.float32)

    def ref(xs_, s1m_):
        hs0, _ = lstm_scan(p0, xs_, kernel="xla",
                           recurrent_activation=HARD)
        hs1, _ = lstm_scan(p1, hs0 + s1m_, kernel="xla",
                           recurrent_activation=HARD)
        return hs1

    def fused(xs_, s1m_):
        hs1, _ = pallas_lstm2(xs_, s1m_, p0.kernel, p0.bias, p1.bias,
                              p0.recurrent, p1.kernel, p1.recurrent,
                              dropout_p=0.0, seed=0,
                              recurrent_activation=HARD)
        return hs1

    hs_ref = ref(xs, s1m)
    with pltpu.force_tpu_interpret_mode():
        hs = fused(xs, s1m)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-5)

    W = jnp.arange(1, T * B * H + 1).reshape(T, B, H) * 1e-3
    g_ref = jax.grad(lambda a, b: jnp.sum(ref(a, b) * W), (0, 1))(xs, s1m)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda a, b: jnp.sum(fused(a, b) * W), (0, 1))(xs, s1m)
    for x, y in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_hard_grads_differ_from_sigmoid_grads():
    """Negative control: the hard flag actually reaches the backward — the
    two gate flavors must NOT produce the same gradients."""
    k = jax.random.split(jax.random.key(2), 2)
    p0 = lstm_init(k[0], D, H)
    xs = jax.random.normal(k[1], (T, B, D), jnp.float32)

    def loss(xs_, act):
        hs, _ = lstm_scan(p0, xs_, kernel="xla", recurrent_activation=act)
        return jnp.sum(hs ** 2)

    g_sig = jax.grad(loss)(xs, "sigmoid")
    g_hard = jax.grad(loss)(xs, HARD)
    assert float(jnp.abs(g_sig - g_hard).max()) > 1e-4


# --- v3 biaxial stacks (geometry mirrors tests/test_pallas_biax.py) --------

TN, NN, BN, Ht, Hb, C = 6, 5, 8, 16, 12, 3
F_NOTE = Ht + C
F_TIME = 10


def test_biax_time_stack_hard_forward_and_grads():
    from music_generator_tpu.ops.pallas_biax import biax_time_stack

    ks = jax.random.split(jax.random.key(3), 5)
    l0 = lstm_init(ks[0], F_TIME, Hb)
    l1 = lstm_init(ks[1], Hb, Hb)
    x = jax.random.normal(ks[2], (TN, NN, BN, F_TIME))
    s0 = jax.random.normal(ks[3], (TN, BN, F_TIME)) * 0.3
    s1 = jax.random.normal(ks[4], (TN, BN, Hb)) * 0.3
    args = (x, s0, s1, l0.kernel, l0.bias, l1.bias, l0.recurrent,
            l1.kernel, l1.recurrent)

    def ref(a):
        x_, s0_, s1_, w0, b0, b1, u0, w1, u1 = a
        l0_ = l0._replace(kernel=w0, bias=b0, recurrent=u0)
        l1_ = l1._replace(kernel=w1, bias=b1, recurrent=u1)
        xx = x_ + s0_[:, None]
        h0, _ = lstm_scan(l0_, xx.reshape(TN, NN * BN, F_TIME),
                          compute_dtype=jnp.float32, kernel="xla",
                          recurrent_activation=HARD)
        h0 = h0.reshape(TN, NN, BN, Hb)
        h1, _ = lstm_scan(l1_, (h0 + s1_[:, None]).reshape(TN, NN * BN, Hb),
                          compute_dtype=jnp.float32, kernel="xla",
                          recurrent_activation=HARD)
        return h1.reshape(TN, NN, BN, Hb)

    def fused(a):
        return biax_time_stack(*a, dropout_p=0.0, seed=0,
                               compute_dtype=jnp.float32,
                               recurrent_activation=HARD)

    W = jnp.arange(1, TN * NN * BN * Hb + 1).reshape(TN, NN, BN, Hb) * 1e-3
    with pltpu.force_tpu_interpret_mode():
        got = fused(args)
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(args)),
                               atol=1e-5)
    g_ref = jax.grad(lambda a: jnp.sum(ref(a) * W))(args)
    for a_, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-4)


def test_biax_note_stack_hard_forward_and_grads():
    from music_generator_tpu.ops.pallas_biax import biax_note_stack

    ks = jax.random.split(jax.random.key(4), 8)
    l0 = lstm_init(ks[0], F_NOTE, Hb)
    l1 = lstm_init(ks[1], Hb, Hb)
    ht = jax.random.normal(ks[2], (TN, NN, BN, Ht)) * 0.5
    ch = jax.random.normal(ks[3], (NN, TN, BN, C)) * 0.5
    s0 = jax.random.normal(ks[4], (TN, BN, F_NOTE)) * 0.3
    s1 = jax.random.normal(ks[5], (TN, BN, Hb)) * 0.3
    wh = jax.random.normal(ks[6], (Hb, 3)) * 0.4
    bh = jax.random.normal(ks[7], (3,)) * 0.1
    args = (ht, ch, s0, s1, l0.kernel, l0.bias, l1.bias, l0.recurrent,
            l1.kernel, l1.recurrent, wh, bh)

    def ref(a):
        ht_, ch_, s0_, s1_, w0, b0, b1, u0, w1, u1, wh_, bh_ = a
        l0_ = l0._replace(kernel=w0, bias=b0, recurrent=u0)
        l1_ = l1._replace(kernel=w1, bias=b1, recurrent=u1)
        x = jnp.concatenate([ht_.transpose(1, 0, 2, 3), ch_], -1) + s0_[None]
        h0, _ = lstm_scan(l0_, x.reshape(NN, TN * BN, F_NOTE),
                          compute_dtype=jnp.float32, kernel="xla",
                          recurrent_activation=HARD)
        h0 = h0.reshape(NN, TN, BN, Hb)
        h1, _ = lstm_scan(l1_, (h0 + s1_[None]).reshape(NN, TN * BN, Hb),
                          compute_dtype=jnp.float32, kernel="xla",
                          recurrent_activation=HARD)
        z = h1.reshape(NN, TN, BN, Hb) @ wh_ + bh_
        # Heads stay PLAIN sigmoid whatever the recurrent activation.
        return jnp.concatenate([jax.nn.sigmoid(z[..., :2]), z[..., 2:]], -1)

    def fused(a):
        return biax_note_stack(*a, dropout_p=0.0, seed=0,
                               compute_dtype=jnp.float32,
                               recurrent_activation=HARD)

    W = jnp.arange(1, NN * TN * BN * 3 + 1).reshape(NN, TN, BN, 3) * 1e-3
    with pltpu.force_tpu_interpret_mode():
        got = fused(args)
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(args)),
                               atol=1e-5)
    g_ref = jax.grad(lambda a: jnp.sum(ref(a) * W))(args)
    for a_, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-4)


# --- generation pitch kernel ------------------------------------------------

def test_fused_gen_kernel_hard_matches_scan():
    """The fused pitch loop with hard gates reproduces the XLA scan path
    (same probabilities ⇒ same draws off knife edges), at T=1 and 0.9."""
    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.dataset import compute_genre
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.models.deepj import DeepJ, init_params

    cfg_x = test_config(lstm_recurrent_activation=HARD)
    cfg_f = test_config(lstm_kernel="pallas", fused_gen_kernel=True,
                        fused_axis_kernel=False,
                        lstm_recurrent_activation=HARD)
    params = init_params(jax.random.key(5), cfg_x)
    model_x, model_f = DeepJ(cfg_x), DeepJ(cfg_f)
    s_x, s_f = Sampler(model_x, params), Sampler(model_f, params)

    styles = jnp.asarray(np.stack([compute_genre(0, cfg_x),
                                   compute_genre(2, cfg_x)]), jnp.float32)
    emb = model_x.style_embedding(params, styles)
    feats, _ = model_x.time_axis_step(
        params, jnp.zeros((2, cfg_x.num_notes, 3)),
        jnp.zeros((2, cfg_x.notes_per_bar)), emb,
        model_x.init_time_state(2))
    us = jax.random.uniform(jax.random.key(6), (2, cfg_x.num_notes, 2))
    for t in (1.0, 0.9):
        temp = jnp.full((2,), t)
        ref = s_x._note_scan(params, feats, emb, temp, us)
        with pltpu.force_tpu_interpret_mode():
            fused = s_f._note_scan(params, feats, emb, temp, us)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                                   atol=1e-4)


def test_model_kernel_no_longer_forces_xla_for_hard_gates():
    from music_generator_tpu.config import test_config
    from music_generator_tpu.models.deepj import DeepJ

    m = DeepJ(test_config(lstm_kernel="pallas",
                          lstm_recurrent_activation=HARD))
    assert m._kernel() == "pallas"


def test_unknown_recurrent_activation_fails_loudly():
    """The fused stacks translate the gate flavor via `== "hard_sigmoid"`,
    so an unknown value (e.g. the dash typo) would SILENTLY run sigmoid
    gates — exactly what the pre-r5 xla-only routing raised on.  DeepJ
    construction is the chokepoint: it must reject anything outside the
    registry (review r5 finding)."""
    from music_generator_tpu.config import test_config
    from music_generator_tpu.models.deepj import DeepJ

    with pytest.raises(ValueError, match="lstm_recurrent_activation"):
        DeepJ(test_config(lstm_recurrent_activation="hard-sigmoid"))
