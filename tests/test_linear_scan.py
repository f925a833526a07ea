"""The parallel-scan time-axis study variant (ops/linear_scan.py,
Config.time_axis_kind="linear" — VERDICT r3 next #8).  Pins: the
associative form computes the same recurrence as the sequential oracle,
the streaming step matches the batched scan, and the variant model
trains (gradients flow, loss decreases)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_generator_tpu.config import test_config as make_test_config
from music_generator_tpu.data.synth import random_batch
from music_generator_tpu.models.deepj import DeepJ, init_params
from music_generator_tpu.ops.linear_scan import (
    glru_init,
    glru_scan,
    glru_scan_sequential,
    glru_step,
)

CFG = make_test_config().replace(time_axis_kind="linear",
                                 compute_dtype="float32",
                                 lstm_kernel="xla")


def test_associative_scan_matches_sequential():
    p = glru_init(jax.random.key(0), 7, 5)
    xs = jax.random.normal(jax.random.key(1), (33, 4, 7))
    par = glru_scan(p, xs)
    seq = glru_scan_sequential(p, xs)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=1e-6, rtol=1e-6)


def test_step_chain_matches_scan():
    p = glru_init(jax.random.key(0), 7, 5)
    xs = jax.random.normal(jax.random.key(1), (9, 4, 7))
    hs = glru_scan_sequential(p, xs)
    h = jnp.zeros((4, 5))
    for t in range(9):
        h = glru_step(p, xs[t], h)
        np.testing.assert_allclose(np.asarray(h), np.asarray(hs[t]),
                                   atol=1e-6)


def test_variant_forward_and_gradients():
    """The linear-kind model produces valid predictions and every
    parameter (including both GLRU kernels) receives gradient."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(0), CFG)
    from music_generator_tpu.ops.linear_scan import GLRUParams
    assert isinstance(params.time_axis[0].lstm, GLRUParams)
    batch = random_batch(CFG, rolled_targets=True)

    def loss_fn(p):
        return model.loss(p, batch, train=False)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for layer in grads.time_axis:
        assert float(jnp.abs(layer.lstm.kernel).sum()) > 0


def test_variant_trains():
    from music_generator_tpu.parallel.mesh import make_mesh
    from music_generator_tpu.parallel.train_step import (
        create_train_state, make_train_step)
    model = DeepJ(CFG)
    mesh = make_mesh(jax.devices()[:1])
    state, opt = create_train_state(model, seed=0)
    step = make_train_step(model, opt, mesh)
    batch = random_batch(CFG, rolled_targets=True)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_variant_streaming_matches_batched():
    """time_axis_step chained over T equals the batched time_axis for the
    linear kind — the generation path works for the variant too."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(0), CFG)
    G, T, N = 2, 6, CFG.num_notes
    notes = np.asarray(
        jax.random.bernoulli(jax.random.key(1), 0.2, (G, T, N, 3)),
        np.float32)
    beat = np.asarray(jax.nn.one_hot(np.arange(T) % CFG.notes_per_bar,
                                     CFG.notes_per_bar))
    beat = np.broadcast_to(beat[None], (G, T, CFG.notes_per_bar))
    style = np.zeros((G, CFG.num_styles), np.float32)
    style[:, 0] = 1.0
    emb = model.style_embedding(params, jnp.asarray(style))

    emb_t = jnp.broadcast_to(jnp.asarray(emb)[:, None],
                             (G, T, CFG.style_units))
    batched = model.time_axis(params, jnp.asarray(notes), jnp.asarray(beat),
                              emb_t)

    state = model.init_time_state(G)
    assert len(state[0]) == 1          # (h,) — no cell state
    for t in range(T):
        feats, state = model.time_axis_step(
            params, jnp.asarray(notes[:, t]), jnp.asarray(beat[:, t]),
            emb, state)
        np.testing.assert_allclose(np.asarray(feats),
                                   np.asarray(batched[:, t]), atol=1e-5)
