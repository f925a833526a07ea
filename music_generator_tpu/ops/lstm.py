"""LSTM cell and sequence scan, TPU-first.

Replaces the cuDNN LSTMs behind the reference's Keras layers
(ref: model.py:84,122).  Two design decisions aimed at the MXU:

1. The input projection x_t @ W for ALL timesteps is hoisted out of the
   recurrence into one large [T*B, D] x [D, 4H] matmul — the MXU-friendly
   shape — so the scan body only carries the small h_t @ U recurrence.
2. The scan body is either a plain `lax.scan` (differentiable, used for
   training) or a fused Pallas kernel that keeps h/c and U resident in VMEM
   across all timesteps (see ops/pallas_lstm.py), selected by config.

Gate order is (i, f, g, o) with unit forget bias, kernel glorot_uniform and
recurrent orthogonal init — matching Keras LSTM defaults so loss curves are
comparable with the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    kernel: jax.Array      # [input_dim, 4*hidden]
    recurrent: jax.Array   # [hidden, 4*hidden]
    bias: jax.Array        # [4*hidden]


def lstm_init(key: jax.Array, input_dim: int, hidden: int,
              dtype=jnp.float32) -> LSTMParams:
    """Keras-default initialization: glorot_uniform kernel, orthogonal
    recurrent, zero bias with unit forget gate."""
    k_kernel, k_rec = jax.random.split(key)
    kernel = jax.nn.initializers.glorot_uniform()(
        k_kernel, (input_dim, 4 * hidden), dtype)
    recurrent = jax.nn.initializers.orthogonal()(
        k_rec, (hidden, 4 * hidden), dtype)
    bias = jnp.zeros((4 * hidden,), dtype)
    # Unit forget bias (gates ordered i, f, g, o).
    bias = bias.at[hidden:2 * hidden].set(1.0)
    return LSTMParams(kernel, recurrent, bias)


def _keras2_hard_sigmoid(x: jax.Array) -> jax.Array:
    """Keras 2's hard_sigmoid: clip(0.2x + 0.5, 0, 1) — NOT Keras 3's
    x/6 + 0.5 redefinition.  The reference era's LSTM default
    recurrent_activation (docs/MIGRATION.md deviation #12)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


_RECURRENT_ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "hard_sigmoid": _keras2_hard_sigmoid,
}


def _gates(z: jax.Array, c: jax.Array, hidden: int,
           recurrent_activation: str = "sigmoid",
           ) -> Tuple[jax.Array, jax.Array]:
    """Apply the four-gate nonlinearity.  z = x@W + h@U + b, shape [B, 4H]."""
    act = _RECURRENT_ACTIVATIONS[recurrent_activation]
    i = act(z[:, :hidden])
    f = act(z[:, hidden:2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden:3 * hidden])
    o = act(z[:, 3 * hidden:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(params: LSTMParams, x: jax.Array, h: jax.Array,
              c: jax.Array, compute_dtype=None,
              recurrent_activation: str = "sigmoid",
              ) -> Tuple[jax.Array, jax.Array]:
    """Single cell step: x [B, D], h/c [B, H] → (h', c')."""
    hidden = params.recurrent.shape[0]
    dt = compute_dtype or x.dtype
    z = (x.astype(dt) @ params.kernel.astype(dt)
         + h.astype(dt) @ params.recurrent.astype(dt)
         + params.bias.astype(dt))
    return _gates(z.astype(jnp.float32), c.astype(jnp.float32), hidden,
                  recurrent_activation)


def lstm_scan(params: LSTMParams, xs: jax.Array,
              h0: Optional[jax.Array] = None,
              c0: Optional[jax.Array] = None,
              compute_dtype=None,
              kernel: str = "xla",
              recurrent_activation: str = "sigmoid",
              ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run the LSTM over a sequence.

    xs: [T, B, D] time-major.  Returns (hs [T, B, H], (h_T, c_T)).

    The x @ W projection for all T steps runs as one big matmul up front;
    the recurrence then only computes h @ U per step.
    """
    T, B, D = xs.shape
    hidden = params.recurrent.shape[0]
    dt = compute_dtype or xs.dtype

    if h0 is None:
        h0 = jnp.zeros((B, hidden), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, hidden), jnp.float32)

    # One [T*B, D] @ [D, 4H] MXU matmul for the whole sequence.
    xw = (xs.reshape(T * B, D).astype(dt) @ params.kernel.astype(dt)
          + params.bias.astype(dt)).reshape(T, B, 4 * hidden)

    if kernel == "pallas":
        # r5: the fused kernels implement BOTH gate flavors — sigmoid and
        # Keras 2's hard_sigmoid (deviation #12) — so reference-trained
        # weights no longer forfeit the fused path (VERDICT r4 #6).
        if recurrent_activation not in _RECURRENT_ACTIVATIONS:
            raise ValueError(
                f"unknown recurrent_activation={recurrent_activation!r}")
        from music_generator_tpu.ops.pallas_lstm import pallas_lstm_recurrence
        return pallas_lstm_recurrence(xw, params.recurrent, h0, c0, dt,
                                      recurrent_activation)

    rec = params.recurrent.astype(dt)

    def body(carry, xw_t):
        h, c = carry
        z = xw_t.astype(jnp.float32) + (h.astype(dt) @ rec).astype(jnp.float32)
        h_new, c_new = _gates(z, c, hidden, recurrent_activation)
        return (h_new, c_new), h_new

    (h_fin, c_fin), hs = jax.lax.scan(body, (h0, c0), xw)
    return hs, (h_fin, c_fin)
