"""Fused two-layer LSTM stack tests (interpret mode, dropout disabled —
the interpreter's PRNG is a stub; the dropout path is validated on TPU by
tools/tpu_validate_lstm2.py's finite-difference check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan
from music_generator_tpu.ops.pallas_lstm2 import pallas_lstm2

T, B, D, H = 5, 8, 12, 8


@pytest.fixture(scope="module")
def setup():
    k = jax.random.split(jax.random.key(0), 4)
    p0 = lstm_init(k[0], D, H)
    p1 = lstm_init(k[1], H, H)
    xs = jax.random.normal(k[2], (T, B, D), jnp.float32)
    s1m = 0.1 * jax.random.normal(k[3], (T, B, H), jnp.float32)
    return p0, p1, xs, s1m


def _unfused(p0, p1, xs, s1m):
    """Reference: two single scans with the style term added between."""
    hs0, (h0T, c0T) = lstm_scan(p0, xs, kernel="xla")
    x1 = hs0 + s1m
    hs1, (h1T, c1T) = lstm_scan(p1, x1, kernel="xla")
    return hs0, hs1, (h0T, c0T, h1T, c1T)


def _fused(p0, p1, xs, s1m):
    return pallas_lstm2(xs, s1m, p0.kernel, p0.bias, p1.bias,
                        p0.recurrent, p1.kernel, p1.recurrent,
                        dropout_p=0.0, seed=0)


def test_forward_matches_unfused(setup):
    p0, p1, xs, s1m = setup
    _, hs1_ref, states_ref = _unfused(p0, p1, xs, s1m)
    with pltpu.force_tpu_interpret_mode():
        hs1, states = _fused(p0, p1, xs, s1m)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs1_ref),
                               atol=1e-5)
    for a, b in zip(states, states_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_backward_matches_unfused(setup):
    p0, p1, xs, s1m = setup

    def loss_ref(p0, p1, xs, s1m):
        _, hs1, (h0T, c0T, h1T, c1T) = _unfused(p0, p1, xs, s1m)
        return (jnp.sum(hs1 ** 2) + jnp.sum(h1T) + 2 * jnp.sum(c1T)
                + 0.5 * jnp.sum(c0T))

    def loss_fused(p0, p1, xs, s1m):
        hs1, (h0T, c0T, h1T, c1T) = _fused(p0, p1, xs, s1m)
        return (jnp.sum(hs1.astype(jnp.float32) ** 2) + jnp.sum(h1T)
                + 2 * jnp.sum(c1T) + 0.5 * jnp.sum(c0T))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p0, p1, xs, s1m)
    with pltpu.force_tpu_interpret_mode():
        g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p0, p1, xs, s1m)

    # Layer-0 params.
    np.testing.assert_allclose(np.asarray(g_ref[0].kernel),
                               np.asarray(g_fus[0].kernel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[0].recurrent),
                               np.asarray(g_fus[0].recurrent), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[0].bias),
                               np.asarray(g_fus[0].bias), atol=1e-4)
    # Layer-1 params.
    np.testing.assert_allclose(np.asarray(g_ref[1].kernel),
                               np.asarray(g_fus[1].kernel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[1].recurrent),
                               np.asarray(g_fus[1].recurrent), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[1].bias),
                               np.asarray(g_fus[1].bias), atol=1e-4)
    # Inputs.
    np.testing.assert_allclose(np.asarray(g_ref[2]), np.asarray(g_fus[2]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ref[3]), np.asarray(g_fus[3]),
                               atol=1e-4)
