"""v3 fused biaxial stack kernels (ops/pallas_biax.py), interpret mode.

Three layers of evidence:
  1. p=0 forward + EVERY gradient vs a plain lax.scan reference (exact).
  2. p>0: the mask-dump sibling exposes the in-kernel masks; a plain-JAX
     replica built from those masks must reproduce the fused forward AND
     its jax.grad must match the kernel's custom VJP (the round-1 lesson:
     finite differences can't validate in-kernel-mask VJPs; an exact
     mask-replica can).
  3. Mask statistics: keep-rate near 1-p, values in {0, 1/keep}.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan
from music_generator_tpu.ops.pallas_biax import (
    biax_note_stack,
    biax_time_stack,
    note_stack_dump_masks,
    time_stack_dump_masks,
)

T, N, B, Ht, H, C = 6, 5, 8, 16, 12, 3
F_NOTE = Ht + C
F_TIME = 10


@pytest.fixture(scope="module")
def time_inputs():
    ks = jax.random.split(jax.random.key(0), 6)
    l0 = lstm_init(ks[0], F_TIME, H)
    l1 = lstm_init(ks[1], H, H)
    x = jax.random.normal(ks[2], (T, N, B, F_TIME))
    s0 = jax.random.normal(ks[3], (T, B, F_TIME)) * 0.3
    s1 = jax.random.normal(ks[4], (T, B, H)) * 0.3
    args = (x, s0, s1, l0.kernel, l0.bias, l1.bias, l0.recurrent,
            l1.kernel, l1.recurrent)
    return args, (l0, l1)


@pytest.fixture(scope="module")
def note_inputs():
    ks = jax.random.split(jax.random.key(1), 10)
    l0 = lstm_init(ks[0], F_NOTE, H)
    l1 = lstm_init(ks[1], H, H)
    ht = jax.random.normal(ks[2], (T, N, B, Ht)) * 0.5
    ch = jax.random.normal(ks[3], (N, T, B, C)) * 0.5
    s0 = jax.random.normal(ks[4], (T, B, F_NOTE)) * 0.3
    s1 = jax.random.normal(ks[5], (T, B, H)) * 0.3
    wh = jax.random.normal(ks[6], (H, 3)) * 0.4
    bh = jax.random.normal(ks[7], (3,)) * 0.1
    args = (ht, ch, s0, s1, l0.kernel, l0.bias, l1.bias, l0.recurrent,
            l1.kernel, l1.recurrent, wh, bh)
    return args, (l0, l1)


def _time_ref(args, l0, l1, masks=None):
    x, s0, s1, w0, b0, b1, u0, w1, u1 = args
    l0_ = l0._replace(kernel=w0, bias=b0, recurrent=u0)
    l1_ = l1._replace(kernel=w1, bias=b1, recurrent=u1)
    m0, m1, mmid = masks if masks else (1.0, 1.0, 1.0)
    xx = x + s0[:, None] * m0
    h0, _ = lstm_scan(l0_, xx.reshape(T, N * B, F_TIME),
                      compute_dtype=jnp.float32, kernel="xla")
    h0 = h0.reshape(T, N, B, H)
    x1 = h0 * mmid + s1[:, None] * m1
    h1, _ = lstm_scan(l1_, x1.reshape(T, N * B, H),
                      compute_dtype=jnp.float32, kernel="xla")
    return h1.reshape(T, N, B, H)


def _note_ref(args, l0, l1, masks=None):
    ht, ch, s0, s1, w0, b0, b1, u0, w1, u1, wh, bh = args
    l0_ = l0._replace(kernel=w0, bias=b0, recurrent=u0)
    l1_ = l1._replace(kernel=w1, bias=b1, recurrent=u1)
    if masks:
        m_in, m0t, m0c, m1, mmid, m_out = masks
    else:
        m_in = m0t = m0c = m1 = mmid = m_out = 1.0
    ht_nm = ht.transpose(1, 0, 2, 3) * m_in
    s0m = jnp.concatenate([s0[None, ..., :Ht] * m0t,
                           s0[None, ..., Ht:] * m0c], -1)
    x = jnp.concatenate([ht_nm, ch], -1) + s0m
    h0, _ = lstm_scan(l0_, x.reshape(N, T * B, F_NOTE),
                      compute_dtype=jnp.float32, kernel="xla")
    h0 = h0.reshape(N, T, B, H)
    x1 = h0 * mmid + s1[None] * m1
    h1, _ = lstm_scan(l1_, x1.reshape(N, T * B, H),
                      compute_dtype=jnp.float32, kernel="xla")
    h1 = h1.reshape(N, T, B, H) * m_out
    z = h1 @ wh + bh
    return jnp.concatenate([jax.nn.sigmoid(z[..., :2]), z[..., 2:]], -1)


def _assert_tree_close(a, b, atol):
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_time_stack_p0_forward_and_grads(time_inputs):
    args, (l0, l1) = time_inputs
    W = jnp.arange(1, T * N * B * H + 1).reshape(T, N, B, H) * 1e-3

    def fused(a):
        return biax_time_stack(*a, dropout_p=0.0, seed=0,
                               compute_dtype=jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = fused(args)
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    ref = _time_ref(args, l0, l1)
    g_ref = jax.grad(lambda a: jnp.sum(_time_ref(a, l0, l1) * W))(args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    _assert_tree_close(g_got, g_ref, atol=1e-4)


def test_note_stack_p0_forward_and_grads(note_inputs):
    args, (l0, l1) = note_inputs
    W = jnp.arange(1, N * T * B * 3 + 1).reshape(N, T, B, 3) * 1e-3

    def fused(a):
        return biax_note_stack(*a, dropout_p=0.0, seed=0,
                               compute_dtype=jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = fused(args)
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    ref = _note_ref(args, l0, l1)
    g_ref = jax.grad(lambda a: jnp.sum(_note_ref(a, l0, l1) * W))(args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    _assert_tree_close(g_got, g_ref, atol=1e-4)


def test_time_stack_dropout_masks_and_grads(time_inputs):
    """p=0.5: the dumped masks rebuild the forward exactly in plain JAX, and
    jax.grad of that replica matches the kernel's custom VJP."""
    args, (l0, l1) = time_inputs
    W = jnp.ones((T, N, B, H)) * 1e-2

    with pltpu.force_tpu_interpret_mode():
        out, masks = time_stack_dump_masks(*args, dropout_p=0.5, seed=7,
                                           compute_dtype=jnp.float32)
    # Mask sanity.
    for m in masks:
        vals = np.unique(np.asarray(m))
        assert set(np.round(vals, 5)) <= {0.0, 2.0}
        assert 0.3 < float((np.asarray(m) > 0).mean()) < 0.7

    ref = _time_ref(args, l0, l1, masks=masks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def fused(a):
        return biax_time_stack(*a, dropout_p=0.5, seed=7,
                               compute_dtype=jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    g_ref = jax.grad(
        lambda a: jnp.sum(_time_ref(a, l0, l1, masks=masks) * W))(args)
    _assert_tree_close(g_got, g_ref, atol=1e-4)


def test_note_stack_dropout_masks_and_grads(note_inputs):
    args, (l0, l1) = note_inputs
    W = jnp.ones((N, T, B, 3)) * 1e-2

    with pltpu.force_tpu_interpret_mode():
        out, masks = note_stack_dump_masks(*args, dropout_p=0.5, seed=9,
                                           compute_dtype=jnp.float32)
    for m in masks:
        vals = np.unique(np.asarray(m))
        assert set(np.round(vals, 5)) <= {0.0, 2.0}
        assert 0.3 < float((np.asarray(m) > 0).mean()) < 0.7
    # Distinct sites draw distinct streams.
    assert not np.array_equal(np.asarray(masks[0]), np.asarray(masks[1]))

    ref = _note_ref(args, l0, l1, masks=masks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def fused(a):
        return biax_note_stack(*a, dropout_p=0.5, seed=9,
                               compute_dtype=jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(lambda a: jnp.sum(fused(a) * W))(args)
    g_ref = jax.grad(
        lambda a: jnp.sum(_note_ref(a, l0, l1, masks=masks) * W))(args)
    _assert_tree_close(g_got, g_ref, atol=1e-4)


def test_masks_deterministic_per_seed(note_inputs):
    args, _ = note_inputs
    with pltpu.force_tpu_interpret_mode():
        _, m_a = note_stack_dump_masks(*args, dropout_p=0.5, seed=3,
                                       compute_dtype=jnp.float32)
        _, m_b = note_stack_dump_masks(*args, dropout_p=0.5, seed=3,
                                       compute_dtype=jnp.float32)
        _, m_c = note_stack_dump_masks(*args, dropout_p=0.5, seed=4,
                                       compute_dtype=jnp.float32)
    for a, b in zip(m_a, m_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not np.array_equal(np.asarray(a), np.asarray(c))
               for a, c in zip(m_a, m_c))
