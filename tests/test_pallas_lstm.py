"""Pallas LSTM kernel tests (interpret mode on CPU; the same kernels run
compiled on TPU — see bench.py and the TPU validation in ops/pallas_lstm.py
docstrings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan

T, B, D, H = 5, 8, 12, 8


@pytest.fixture(scope="module")
def data():
    params = lstm_init(jax.random.key(0), D, H)
    xs = jax.random.normal(jax.random.key(1), (T, B, D), jnp.float32)
    return params, xs


def test_forward_matches_xla(data):
    params, xs = data
    hs_x, (h_x, c_x) = lstm_scan(params, xs, kernel="xla")
    with pltpu.force_tpu_interpret_mode():
        hs_p, (h_p, c_p) = lstm_scan(params, xs, kernel="pallas")
    np.testing.assert_allclose(np.asarray(hs_x), np.asarray(hs_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_x), np.asarray(h_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p), atol=1e-5)


def test_backward_matches_xla(data):
    """All four gradient paths, including cotangents entering through the
    terminal (h_T, c_T) state."""
    params, xs = data

    def mkloss(kern):
        def loss(p, x):
            hs, (h, c) = lstm_scan(p, x, kernel=kern)
            return jnp.sum(hs ** 2) + jnp.sum(h) + 2.0 * jnp.sum(c)
        return loss

    gx = jax.grad(mkloss("xla"), argnums=(0, 1))(params, xs)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(mkloss("pallas"), argnums=(0, 1))(params, xs)

    np.testing.assert_allclose(np.asarray(gx[0].kernel),
                               np.asarray(gp[0].kernel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx[0].recurrent),
                               np.asarray(gp[0].recurrent), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx[0].bias),
                               np.asarray(gp[0].bias), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                               atol=1e-4)


def test_initial_state_grads(data):
    """Gradients flow correctly into h0/c0 (used when differentiating
    through streaming segments)."""
    params, xs = data
    h0 = jax.random.normal(jax.random.key(2), (B, H))
    c0 = jax.random.normal(jax.random.key(3), (B, H))

    def mkloss(kern):
        def loss(h0, c0):
            hs, _ = lstm_scan(params, xs, h0, c0, kernel=kern)
            return jnp.sum(hs ** 2)
        return loss

    gx = jax.grad(mkloss("xla"), argnums=(0, 1))(h0, c0)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(mkloss("pallas"), argnums=(0, 1))(h0, c0)
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]), atol=1e-4)
