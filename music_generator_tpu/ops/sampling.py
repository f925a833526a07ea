"""Sampling primitives for the on-device generation loop
(ref: generate.py:47-58, 81-91)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_temperature(prob: jax.Array, temperature: jax.Array) -> jax.Array:
    """Re-temper a sigmoid probability: inverse-sigmoid, divide by T,
    re-sigmoid (ref: generate.py:81-91).  Vectorized and safe at p∈{0,1}."""
    p = jnp.clip(prob, 1e-7, 1 - 1e-7)
    x = -jnp.log(1.0 / p - 1.0)
    return jax.nn.sigmoid(x / temperature)


def bernoulli(key: jax.Array, prob: jax.Array) -> jax.Array:
    """Bernoulli draw matching the reference's host convention
    `np.random.random() <= prob` (ref: generate.py:52,57).  Inclusive <=,
    like the reference: p=1 always fires (uniform < 1 by construction);
    p=0 fires only on the measure-zero uniform==0 draw — identical to the
    reference's semantics with np.random.random()."""
    u = jax.random.uniform(key, prob.shape)
    return (u <= prob).astype(jnp.float32)
