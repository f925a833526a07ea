"""Gated LINEAR recurrence with a parallel (associative) scan — the
round-4 "move the ceiling" study unit (VERDICT r3 next #8).

The training step's throughput ceiling is architectural: the LSTM time
axis is a strictly sequential T=128 chain because each step's recurrent
matmul consumes h_{t-1} (docs/PERFORMANCE.md "ceiling characterization").
This module implements the standard way to BUY BACK that sequentiality:
a minGRU-style gated linear recurrence

    g_t = sigmoid(x_t @ W_g + b_g)          (update gate)
    z_t = tanh(x_t @ W_z + b_z)             (candidate)
    h_t = (1 - g_t) * h_{t-1} + g_t * z_t

whose recurrence h_t = a_t * h_{t-1} + b_t (a = 1-g, b = g*z) is
ASSOCIATIVE — (a, b) pairs compose as (a1*a2, a2*b1 + b2) — so the whole
time dimension runs in O(log T) depth via `jax.lax.associative_scan`
instead of T sequential steps, and there is no recurrent matmul at all
(the gates depend only on the input).  This is the architecture family of
minGRU/minLSTM ("Were RNNs All We Needed?", arXiv:2410.01201) and the
diagonal-gated branch of LRU/SSM designs; the trade is expressivity (no
hidden-to-hidden mixing) for parallelism.

OFF by default (`Config.time_axis_kind = "lstm"`): the LSTM time axis is
the reference's architecture and the shipped contract.  The study —
throughput AND real-corpus loss parity, both measured on the chip — is
committed at artifacts/parallel_scan_r4/ (tools/run_parallel_scan_study.py)
and summarized in docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GLRUParams(NamedTuple):
    kernel: jax.Array      # [in, 2H] — (gate, candidate) blocks
    bias: jax.Array        # [2H]


def glru_init(key: jax.Array, in_dim: int, units: int,
              dtype=jnp.float32) -> GLRUParams:
    """Keras-default-style init (glorot kernel, zero bias), matching the
    discipline of ops/lstm.lstm_init so the study compares inits apples to
    apples."""
    kernel = jax.nn.initializers.glorot_uniform()(
        key, (in_dim, 2 * units), dtype)
    return GLRUParams(kernel, jnp.zeros((2 * units,), dtype))


def _gates(p: GLRUParams, xs: jax.Array, dt) -> Tuple[jax.Array, jax.Array]:
    """(a, b) coefficients of h_t = a_t h_{t-1} + b_t for inputs
    xs [..., in]: a = 1 - sigmoid(gate), b = sigmoid(gate) * tanh(cand)."""
    H = p.bias.shape[0] // 2
    pre = xs.astype(dt) @ p.kernel.astype(dt) + p.bias.astype(dt)
    g = jax.nn.sigmoid(pre[..., :H])
    z = jnp.tanh(pre[..., H:])
    return 1.0 - g, g * z


def glru_scan(p: GLRUParams, xs: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """xs [T, B, in] → hs [T, B, H], zero initial state, computed with a
    log-depth associative scan (every timestep's gate matmul is one big
    batched [T*B, in] @ [in, 2H] — nothing sequential remains but the
    log2(T) elementwise combine tree)."""
    a, b = _gates(p, xs, compute_dtype)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    _, hs = jax.lax.associative_scan(combine, (a, b), axis=0)
    return hs


def glru_scan_sequential(p: GLRUParams, xs: jax.Array,
                         compute_dtype=jnp.float32) -> jax.Array:
    """Reference semantics: the same recurrence as a sequential lax.scan
    (the parity oracle for the associative form; also the shape a
    backend without associative_scan support would run)."""
    a, b = _gates(p, xs, compute_dtype)

    def step(h, ab):
        at, bt = ab
        h = at * h + bt
        return h, h

    h0 = jnp.zeros(xs.shape[1:-1] + (p.bias.shape[0] // 2,), compute_dtype)
    _, hs = jax.lax.scan(step, h0, (a, b))
    return hs


def glru_step(p: GLRUParams, x: jax.Array, h: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """One streaming step (generation): x [B, in], h [B, H] → new h."""
    a, b = _gates(p, x, compute_dtype)
    return a * h.astype(compute_dtype) + b
