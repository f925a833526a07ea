"""Nadam optimizer with Keras-2 momentum scheduling.

The reference compiles with Keras's `'nadam'` string (ref: model.py:152),
i.e. Keras 2 Nadam: lr 2e-3, β₁ 0.9, β₂ 0.999, ε 1e-7 era default, and the
Dozat momentum schedule μ_t = β₁·(1 − 0.5·0.96^(t·schedule_decay)) with
schedule_decay 0.004.  optax's stock nadam omits the schedule, so this is a
from-scratch optax GradientTransformation implementing the Keras update
exactly (important for loss-curve parity)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class NadamState(NamedTuple):
    count: jax.Array       # int32 step counter
    m_schedule: jax.Array  # float32 ∏ μ_i
    mu: optax.Updates      # first moment
    nu: optax.Updates      # second moment


def nadam(learning_rate: float = 2e-3,
          beta1: float = 0.9,
          beta2: float = 0.999,
          eps: float = 1e-7,
          schedule_decay: float = 0.004) -> optax.GradientTransformation:
    """Keras-2 Nadam as an optax transformation."""

    def init_fn(params):
        return NadamState(
            count=jnp.zeros([], jnp.int32),
            m_schedule=jnp.ones([], jnp.float32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        t = state.count.astype(jnp.float32) + 1.0

        momentum_t = beta1 * (1.0 - 0.5 * 0.96 ** (t * schedule_decay))
        momentum_t1 = beta1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * schedule_decay))
        m_schedule_new = state.m_schedule * momentum_t
        m_schedule_next = m_schedule_new * momentum_t1

        mu = jax.tree.map(
            lambda m, g: beta1 * m + (1.0 - beta1) * g, state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: beta2 * v + (1.0 - beta2) * g * g, state.nu, updates)

        def step(g, m_t, v_t):
            g_prime = g / (1.0 - m_schedule_new)
            m_prime = m_t / (1.0 - m_schedule_next)
            v_prime = v_t / (1.0 - beta2 ** t)
            m_bar = (1.0 - momentum_t) * g_prime + momentum_t1 * m_prime
            return -learning_rate * m_bar / (jnp.sqrt(v_prime) + eps)

        new_updates = jax.tree.map(step, updates, mu, nu)
        return new_updates, NadamState(
            count=state.count + 1,
            m_schedule=m_schedule_new,
            mu=mu,
            nu=nu,
        )

    return optax.GradientTransformation(init_fn, update_fn)
