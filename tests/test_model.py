"""Model tests: shapes, loss masking vs. a numpy oracle, gradient masking,
and — crucially — equivalence between the batched training graph and the
streaming single-step generation path (the weight-sharing contract the
reference engineered with Keras layer caches, ref: model.py:92-93,155-167)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generator_tpu.config import test_config as small_config
from music_generator_tpu.models.deepj import (
    DeepJ,
    Params,
    init_params,
    feature_dim,
    primary_loss,
)

CFG = small_config()
MODEL = DeepJ(CFG)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), CFG)


def _batch(key, B=2, T=None):
    T = T or CFG.seq_len
    N = CFG.num_notes
    ks = jax.random.split(key, 4)
    notes = jax.random.bernoulli(ks[0], 0.1, (B, T, N, 3)).astype(jnp.float32)
    chosen = jax.random.bernoulli(ks[1], 0.1, (B, T, N, 3)).astype(jnp.float32)
    beat = jax.nn.one_hot(jnp.arange(T) % CFG.notes_per_bar, CFG.notes_per_bar)
    beat = jnp.broadcast_to(beat[None], (B, T, CFG.notes_per_bar))
    style = jnp.broadcast_to(
        jax.nn.one_hot(jnp.array([0]), CFG.num_styles)[:, None],
        (B, T, CFG.num_styles)).astype(jnp.float32)
    return notes, chosen, beat, style


def test_forward_shapes(params):
    notes, chosen, beat, style = _batch(jax.random.key(1))
    preds = MODEL.forward(params, notes, chosen, beat, style)
    assert preds.shape == notes.shape
    # play/replay are probabilities.
    assert (preds[..., :2] >= 0).all() and (preds[..., :2] <= 1).all()
    assert preds.dtype == jnp.float32


def test_forward_train_uses_dropout(params):
    notes, chosen, beat, style = _batch(jax.random.key(2))
    p1 = MODEL.forward(params, notes, chosen, beat, style,
                       rng=jax.random.key(3), train=True)
    p2 = MODEL.forward(params, notes, chosen, beat, style,
                       rng=jax.random.key(4), train=True)
    assert not np.allclose(p1, p2)
    # And inference is deterministic.
    p3 = MODEL.forward(params, notes, chosen, beat, style)
    p4 = MODEL.forward(params, notes, chosen, beat, style)
    np.testing.assert_array_equal(p3, p4)


def test_primary_loss_against_numpy_oracle():
    rng = np.random.default_rng(0)
    shape = (2, 4, 6)
    y_true = np.stack([
        rng.integers(0, 2, shape).astype(np.float64),
        rng.integers(0, 2, shape).astype(np.float64),
        rng.uniform(0, 1, shape),
    ], axis=-1)
    y_pred = np.stack([
        rng.uniform(0.01, 0.99, shape),
        rng.uniform(0.01, 0.99, shape),
        rng.uniform(0, 1, shape),
    ], axis=-1)

    total, metrics = primary_loss(jnp.array(y_true), jnp.array(y_pred))

    # Oracle written directly from the formula (ref: model.py:14-20).
    played = y_true[..., 0]
    eps = 1e-7

    def bce(t, p):
        p = np.clip(p, eps, 1 - eps)
        return -(t * np.log(p) + (1 - t) * np.log(1 - p))

    t1 = bce(y_true[..., 0], y_pred[..., 0])
    t2 = bce(y_true[..., 1],
             played * y_pred[..., 1] + (1 - played) * y_true[..., 1])
    t3 = (y_true[..., 2]
          - (played * y_pred[..., 2] + (1 - played) * y_true[..., 2])) ** 2
    expected = np.mean(t1 + t2 + t3)
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def test_loss_masking_zeroes_gradients():
    """Where play target is 0, replay/volume predictions must receive ZERO
    gradient — the subtle part of ref: model.py:18-19."""
    y_true = jnp.zeros((1, 1, 2, 3))          # nothing played
    y_pred = jnp.full((1, 1, 2, 3), 0.5)

    def replay_vol_loss(p):
        total, _ = primary_loss(y_true, p)
        return total

    g = jax.grad(replay_vol_loss)(y_pred)
    # Play-channel gradient is nonzero; replay/volume gradients are exactly 0.
    assert np.abs(g[..., 0]).min() > 0
    np.testing.assert_array_equal(g[..., 1], 0)
    np.testing.assert_array_equal(g[..., 2], 0)

    # With play=1 everywhere, replay/volume gradients flow.
    y_true_on = y_true.at[..., 0].set(1.0)
    g_on = jax.grad(lambda p: primary_loss(y_true_on, p)[0])(y_pred)
    assert np.abs(g_on[..., 1]).min() > 0
    assert np.abs(g_on[..., 2]).min() > 0


def test_streaming_time_axis_matches_batched(params):
    """time_axis over a full sequence == repeated time_axis_step carrying
    state (the training/generation weight-sharing contract)."""
    B, T = 2, 6
    notes, chosen, beat, style = _batch(jax.random.key(5), B=B, T=T)
    style_emb = MODEL.style_embedding(params, style)

    batched = MODEL.time_axis(params, notes, beat, style_emb)

    state = MODEL.init_time_state(B)
    outs = []
    for t in range(T):
        feat, state = MODEL.time_axis_step(
            params, notes[:, t], beat[:, t], style_emb[:, t], state)
        outs.append(feat)
    streamed = jnp.stack(outs, axis=1)

    np.testing.assert_allclose(np.asarray(batched), np.asarray(streamed),
                               atol=1e-5)


def test_streaming_note_axis_matches_batched(params):
    """note_axis over the full grid == note_axis_cell scanned over pitches
    per timestep (teacher-forced chosen)."""
    B, T = 2, 3
    N = CFG.num_notes
    notes, chosen, beat, style = _batch(jax.random.key(6), B=B, T=T)
    style_emb = MODEL.style_embedding(params, style)
    time_out = MODEL.time_axis(params, notes, beat, style_emb)

    batched = MODEL.note_axis(params, time_out, chosen, style_emb)

    for t in range(T):
        state = MODEL.init_note_state(B)
        prev = jnp.zeros((B, 3))
        for n in range(N):
            pred, state = MODEL.note_axis_cell(
                params, time_out[:, t, n], prev, style_emb[:, t], state)
            np.testing.assert_allclose(
                np.asarray(batched[:, t, n]), np.asarray(pred), atol=1e-5)
            prev = chosen[:, t, n]


def test_feature_dim():
    assert feature_dim(CFG) == 1 + 12 + 1 + CFG.octave_units + 16


def test_chromagram_is_pitch_class_correct(params):
    """Each note's chroma feature equals the play count of its pitch class
    (the documented intent of ref: model.py:43-49)."""
    B, T, N = 1, 1, CFG.num_notes
    notes = jnp.zeros((B, T, N, 3))
    # Activate pitch class 5 in two octaves.
    notes = notes.at[0, 0, 5, 0].set(1.0).at[0, 0, 17, 0].set(1.0)
    beat = jnp.zeros((B, T, CFG.notes_per_bar))
    conv = jnp.zeros((B, T, N, CFG.octave_units))
    feats = MODEL.note_features(notes, beat, conv)
    chroma = feats[..., 13]        # 1 pitch_pos + 12 pitch_class → index 13
    for n in range(N):
        expected = 2.0 if n % 12 == 5 else 0.0
        assert float(chroma[0, 0, n]) == expected


def test_jit_forward(params):
    notes, chosen, beat, style = _batch(jax.random.key(7))
    f = jax.jit(lambda p, *a: MODEL.forward(p, *a))
    preds = f(params, notes, chosen, beat, style)
    ref = MODEL.forward(params, notes, chosen, beat, style)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(ref), atol=1e-5)


def test_fused_axis_path_matches_unfused_interpret():
    """Model forward with the fused two-layer Pallas stack (interpret mode)
    equals the unfused XLA path at eval time."""
    from jax.experimental.pallas import tpu as pltpu
    from music_generator_tpu.config import test_config as sc
    cfg_fused = sc(lstm_kernel="pallas", fused_axis_kernel=True)
    cfg_plain = sc(lstm_kernel="xla")
    m_fused, m_plain = DeepJ(cfg_fused), DeepJ(cfg_plain)
    p = init_params(jax.random.key(0), cfg_plain)
    notes, chosen, beat, style = _batch(jax.random.key(8), B=2, T=4)

    ref = m_plain.forward(p, notes, chosen, beat, style)
    with pltpu.force_tpu_interpret_mode():
        fused = m_fused.forward(p, notes, chosen, beat, style)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=2e-5)


def test_dropout_site_ids_are_static():
    """The dropout stream at each site must be a stable function of
    (seed, site name) — never of first-call/trace order (round-1 verdict
    weak #4).  Pin the frozen table values so a refactor that silently
    remaps sites (changing every dropout stream) trips this test."""
    from music_generator_tpu.models.deepj import _site_id

    assert _site_id("in_notes") == 1
    assert _site_id("in_beat") == 2
    assert _site_id("in_chosen") == 3
    assert _site_id("conv") == 4
    assert _site_id("tfuse") == 5
    assert _site_id("nfuse") == 6
    assert _site_id("tstyle0") == 7
    assert _site_id("tdrop1") == 16
    assert _site_id("nstyle0") == 23
    assert _site_id("ndrop1") == 32
    # Beyond the pre-registered table (configs deeper than 8 layers/axis),
    # IDs come from a stable content hash — still order-independent.
    assert _site_id("tstyle11") == _site_id("tstyle11")
    assert _site_id("tstyle11") >= 1000
    assert _site_id("tstyle11") != _site_id("ndrop11")


def test_dropout_site_ids_match_fresh_process():
    """A fresh interpreter derives the same site→ID map (the map used to be
    built lazily in call order, so fused-first vs unfused-first processes
    disagreed)."""
    import json
    import os
    import subprocess
    import sys

    from music_generator_tpu.models.deepj import _SITE_IDS

    code = ("import json\n"
            "from music_generator_tpu.models.deepj import _SITE_IDS\n"
            "print(json.dumps(_SITE_IDS))\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, env=env)
    assert json.loads(out.stdout.strip().splitlines()[-1]) == _SITE_IDS


def test_biax_v3_forward_matches_unfused_interpret():
    """The v3 fully-fused forward (both axes + heads on-chip) equals the
    plain XLA path at eval time, at model level."""
    from jax.experimental.pallas import tpu as pltpu
    from music_generator_tpu.config import test_config as sc
    cfg_v3 = sc(lstm_kernel="pallas", fused_biax_v3=True)
    cfg_plain = sc(lstm_kernel="xla")
    m_v3, m_plain = DeepJ(cfg_v3), DeepJ(cfg_plain)
    assert m_v3._use_biax_v3(init_params(jax.random.key(0), cfg_plain))
    p = init_params(jax.random.key(3), cfg_plain)
    notes, chosen, beat, style = _batch(jax.random.key(9), B=2, T=4)

    ref = m_plain.forward(p, notes, chosen, beat, style)
    with pltpu.force_tpu_interpret_mode():
        got = m_v3.forward(p, notes, chosen, beat, style)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_biax_v3_train_gradients_flow():
    """Train-mode v3 (in-kernel masks) produces finite grads for EVERY
    param leaf, including the fused head weights."""
    from jax.experimental.pallas import tpu as pltpu
    from music_generator_tpu.config import test_config as sc
    from music_generator_tpu.models.deepj import primary_loss
    cfg = sc(lstm_kernel="pallas", fused_biax_v3=True)
    model = DeepJ(cfg)
    p = init_params(jax.random.key(5), cfg)
    notes, chosen, beat, style = _batch(jax.random.key(11), B=2, T=4)

    def loss_fn(p):
        preds = model.forward(p, notes, chosen, beat, style,
                              rng=jax.random.key(1), train=True)
        return primary_loss(chosen, preds)[0]

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_fn)(p)
    for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all(), path
    # Heads and style projections actually receive gradient.
    assert np.abs(np.asarray(g.note_dense.kernel)).sum() > 0
    assert np.abs(np.asarray(g.volume_dense.kernel)).sum() > 0
    assert np.abs(np.asarray(g.time_axis[0].style_proj.kernel)).sum() > 0


def test_param_summary_counts_every_leaf(params):
    """The model.summary() analogue (ref: util.py:16): the printed total
    must equal the exact number of parameters in the pytree."""
    from music_generator_tpu.utils import param_summary
    s = param_summary(params)
    total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert f"{total:,}" in s.splitlines()[-1]
    assert s.splitlines()[-1].startswith("total")
    assert len(s.splitlines()) >= 3          # at least a couple of modules


def test_fused_axis_train_without_rng_disables_dropout():
    """train=True with rng=None must mean NO dropout on the fused-axis
    path too: the pre-fix code passed p=cfg.dropout with a frozen seed 0
    to pallas_lstm2, silently zeroing the SAME activations every step
    while every other site (dropout() with key None) was a no-op."""
    from jax.experimental.pallas import tpu as pltpu
    from music_generator_tpu.config import test_config as sc
    cfg = sc(lstm_kernel="pallas", fused_axis_kernel=True, dropout=0.5)
    m = DeepJ(cfg)
    p = init_params(jax.random.key(0), cfg)
    notes, chosen, beat, style = _batch(jax.random.key(8), B=2, T=4)

    with pltpu.force_tpu_interpret_mode():
        eval_out = m.forward(p, notes, chosen, beat, style, train=False)
        train_no_rng = m.forward(p, notes, chosen, beat, style, rng=None,
                                 train=True)
    np.testing.assert_allclose(np.asarray(train_no_rng),
                               np.asarray(eval_out), atol=1e-6)


def test_init_params_supports_deeper_stacks():
    """The config allows up to 8 layers per axis (_SITE_IDS) and the
    unfused scans handle any depth — init_params must not exhaust its key
    iterator for >6 total layers (it drew from a fixed 16-key split).
    split() is prefix-stable in key count, so the default 2+2 init stays
    byte-identical (pinned by every golden/artifact test)."""
    from music_generator_tpu.config import test_config as sc
    cfg = sc(time_axis_layers=4, note_axis_layers=3)
    p = init_params(jax.random.key(0), cfg)
    assert len(p.time_axis) == 4 and len(p.note_axis) == 3
    for leaf in jax.tree.leaves(p):
        assert np.isfinite(np.asarray(leaf)).all()


def test_keras2_hard_sigmoid_gate_mode():
    """Config(lstm_recurrent_activation="hard_sigmoid") — the Keras-2-era
    gate default (clip(0.2x+0.5, 0, 1), deviation #12) for running
    imported reference-trained weights faithfully.  Must change the
    forward and match a hand-stepped hard_sigmoid cell.  (Since r5 the
    gate mode no longer forces the XLA kernel — fused parity is pinned
    by tests/test_hard_gates.py.)"""
    from music_generator_tpu.config import test_config as sc
    from music_generator_tpu.ops.lstm import lstm_init, lstm_step

    cfg_s = sc(lstm_kernel="xla")
    cfg_h = sc(lstm_kernel="xla",
               lstm_recurrent_activation="hard_sigmoid")

    p = init_params(jax.random.key(0), cfg_s)
    notes, chosen, beat, style = _batch(jax.random.key(8), B=2, T=4)
    out_s = DeepJ(cfg_s).forward(p, notes, chosen, beat, style)
    out_h = DeepJ(cfg_h).forward(p, notes, chosen, beat, style)
    assert np.max(np.abs(np.asarray(out_s) - np.asarray(out_h))) > 1e-4

    # Cell-level oracle: one hard_sigmoid step against the formula.
    lp = lstm_init(jax.random.key(3), 5, 4)
    x = jax.random.normal(jax.random.key(4), (2, 5))
    h0 = jnp.zeros((2, 4))
    c0 = jnp.zeros((2, 4))
    h1, c1 = lstm_step(lp, x, h0, c0, recurrent_activation="hard_sigmoid")
    z = np.asarray(x @ lp.kernel + lp.bias)
    hs = lambda v: np.clip(0.2 * v + 0.5, 0.0, 1.0)
    i, f, g, o = (hs(z[:, :4]), hs(z[:, 4:8]), np.tanh(z[:, 8:12]),
                  hs(z[:, 12:]))
    c_ref = f * np.asarray(c0) + i * g
    np.testing.assert_allclose(np.asarray(c1), c_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), o * np.tanh(c_ref), atol=1e-6)
