"""Fused Pallas LSTM recurrence for TPU.

This is the framework's native compute kernel, replacing the cuDNN LSTM the
reference delegated to (ref: requirements.txt:2 tensorflow-gpu;
model.py:84,122).

Layout: the input projection xw_t = x_t @ W + b for all T steps is computed
outside as one large MXU matmul (see ops/lstm.py).  This kernel runs the
sequential part: per step, z = xw_t + h @ U, four-gate nonlinearity, state
update.  The recurrent matrix U and the h/c state live in VMEM scratch for
the entire scan — zero HBM round-trips for state — while Pallas's grid
pipeline double-buffers the xw_t blocks from HBM.

Grid: (batch_tiles, T) with T innermost, so each batch tile scans all its
timesteps with state resident in VMEM, then moves to the next tile.  Batch
tiling keeps peak VMEM bounded (~4 MB at tile 256) for arbitrarily large
effective batches (the model folds batch×notes / batch×time into this axis).

The kernel pair is wrapped in a custom_vjp: the forward also emits cell-state
and gate-activation tapes (activations in the compute dtype to halve tape
bandwidth), and the backward is a second Pallas kernel walking each tile's
timesteps in reverse, accumulating dU in VMEM scratch and streaming d(xw)
out.  Training runs entirely on fused kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_batch_tile(B: int, max_tile: int = 256) -> int:
    """Largest divisor of B that is ≤ max_tile and a multiple of 8, else B."""
    for bt in range(min(B, max_tile), 7, -1):
        if B % bt == 0 and bt % 8 == 0:
            return bt
    return B


def _fwd_kernel(xw_ref, u_ref, h0_ref, c0_ref,
                hs_ref, cs_ref, acts_ref, hT_ref, cT_ref,
                h_s, c_s):
    """Grid (NB, T): one batch tile × one timestep per invocation.  The
    scratch h_s/c_s persist across the T-innermost iterations of a tile."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    hidden = u_ref.shape[0]
    z = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:].astype(u_ref.dtype), u_ref[:],
        preferred_element_type=jnp.float32)

    i = jax.nn.sigmoid(z[:, :hidden])
    f = jax.nn.sigmoid(z[:, hidden:2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(z[:, 3 * hidden:])

    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)

    # Tapes for the backward pass (activations in compute dtype).
    acts_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(acts_ref.dtype)
    cs_ref[0] = c_s[:]          # c_{t-1}, needed for df
    hs_ref[0] = h_new
    h_s[:] = h_new
    c_s[:] = c_new

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_new
        cT_ref[:] = c_new


def _bwd_kernel(u_ref, acts_ref, cs_prev_ref, hs_prev_ref, dhs_ref, dcT_ref,
                dxw_ref, du_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, du_s):
    """Grid (NB, T): step r walks t = T-1-r within each batch tile (the tapes
    are pre-reversed along time).  Carries dh/dc in scratch per tile,
    accumulates dU across the entire grid, streams d(xw_t) out.  Terminal
    cotangents enter as initial carries: dhT pre-folded into dhs[T-1], dcT
    seeding dc_s."""
    b = pl.program_id(0)
    NB = pl.num_programs(0)
    r = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(r == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = dcT_ref[:]

    @pl.when((r == 0) & (b == 0))
    def _():
        du_s[:] = jnp.zeros_like(du_s)

    hidden = u_ref.shape[0]
    acts = acts_ref[0].astype(jnp.float32)
    i = acts[:, :hidden]
    f = acts[:, hidden:2 * hidden]
    g = acts[:, 2 * hidden:3 * hidden]
    o = acts[:, 3 * hidden:]
    c_prev = cs_prev_ref[0].astype(jnp.float32)

    c_new = f * c_prev + i * g
    tanh_c = jnp.tanh(c_new)

    dh = dh_s[:] + dhs_ref[0].astype(jnp.float32)
    do = dh * tanh_c
    dc = dc_s[:] + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g
    df = dc * c_prev
    dg = dc * i

    dz = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)

    dxw_ref[0] = dz.astype(dxw_ref.dtype)
    # dU += h_{t-1}^T @ dz ; dh_{t-1} = dz @ U^T
    h_prev = hs_prev_ref[0]
    du_s[:] += jnp.dot(h_prev.T.astype(u_ref.dtype), dz.astype(u_ref.dtype),
                       preferred_element_type=jnp.float32)
    dh_prev = jnp.dot(dz.astype(u_ref.dtype), u_ref[:].T,
                      preferred_element_type=jnp.float32)

    dh_s[:] = dh_prev
    dc_s[:] = dc * f

    @pl.when(r == T - 1)
    def _():
        dh0_ref[:] = dh_prev
        dc0_ref[:] = (dc * f)

    @pl.when((r == T - 1) & (b == NB - 1))
    def _():
        du_ref[:] = du_s[:]


def _tiling(B: int) -> Tuple[int, int]:
    BT = _pick_batch_tile(B)
    if B % BT != 0:
        return B, 1
    return BT, B // BT


def _forward_impl(xw, u, h0, c0, compute_dtype):
    T, B, H4 = xw.shape
    H = H4 // 4
    f32 = jnp.float32
    BT, NB = _tiling(B)

    hs, cs_prev, acts, hT, cT = pl.pallas_call(
        _fwd_kernel,
        grid=(NB, T),
        in_specs=[
            pl.BlockSpec((1, BT, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), f32),             # hs
            jax.ShapeDtypeStruct((T, B, H), f32),             # c_{t-1} tape
            jax.ShapeDtypeStruct((T, B, H4), compute_dtype),  # gate acts tape
            jax.ShapeDtypeStruct((B, H), f32),                # h_T
            jax.ShapeDtypeStruct((B, H), f32),                # c_T
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), f32),
            pltpu.VMEM((BT, H), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H4 + 10 * T * B * H4,
            bytes_accessed=(xw.size * xw.dtype.itemsize
                            + 3 * T * B * H * 4 + T * B * H4),
            transcendentals=4 * T * B * H4,
        ),
    )(xw.astype(compute_dtype), u.astype(compute_dtype),
      h0.astype(f32), c0.astype(f32))
    return hs, cs_prev, acts, hT, cT


def _fwd_rule(xw, u, h0, c0, compute_dtype):
    hs, cs_prev, acts, hT, cT = _forward_impl(xw, u, h0, c0, compute_dtype)
    residuals = (u, acts, cs_prev, hs, h0)
    return (hs, (hT, cT)), residuals


def _bwd_rule(compute_dtype, residuals, grads):
    u, acts, cs_prev, hs, h0 = residuals
    dhs, (dhT, dcT) = grads
    T, B, H = hs.shape
    H4 = 4 * H
    f32 = jnp.float32
    BT, NB = _tiling(B)

    # Fold terminal cotangents into the recurrence: dhT joins the last step's
    # streamed cotangent; dcT seeds the dc carry inside the kernel.
    dhs = dhs.astype(f32).at[T - 1].add(dhT.astype(f32))
    dcT = dcT.astype(f32)

    # h_{t-1} tape: shift hs right by one, h_{-1} = h0.
    hs_prev = jnp.concatenate([h0[None].astype(f32), hs[:-1]], axis=0)

    # Reverse along time so grid index r maps to t = T-1-r with plain forward
    # block indexing.
    rev = lambda a: jnp.flip(a, axis=0)

    dxw_rev, du, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(NB, T),
        in_specs=[
            pl.BlockSpec((H, H4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H4), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, H), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H4), lambda b, r: (r, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), f32),
            jax.ShapeDtypeStruct((H, H4), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), f32),
            pltpu.VMEM((BT, H), f32),
            pltpu.VMEM((H, H4), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * B * H * H4 + 20 * T * B * H4,
            bytes_accessed=3 * T * B * H4 * 4,
            transcendentals=2 * T * B * H,
        ),
    )(u.astype(compute_dtype), rev(acts), rev(cs_prev), rev(hs_prev),
      rev(dhs), dcT)

    dxw = jnp.flip(dxw_rev, axis=0)
    return dxw.astype(compute_dtype), du.astype(u.dtype), dh0, dc0


@functools.lru_cache(maxsize=None)
def _make_recurrence(dtype_name: str):
    """Build (and cache) the custom-VJP'd recurrence closed over the compute
    dtype — dtypes as closure, arrays as arguments."""
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def recurrence(xw, u, h0, c0):
        hs, _, _, hT, cT = _forward_impl(xw, u, h0, c0, compute_dtype)
        return hs, (hT, cT)

    def fwd_rule(xw, u, h0, c0):
        return _fwd_rule(xw, u, h0, c0, compute_dtype)

    def bwd_rule(residuals, grads):
        return _bwd_rule(compute_dtype, residuals, grads)

    recurrence.defvjp(fwd_rule, bwd_rule)
    return recurrence


def pallas_lstm_recurrence(xw, u, h0, c0, compute_dtype=jnp.float32):
    """Fused recurrence: xw [T, B, 4H] (= x@W + b), u [H, 4H], h0/c0 [B, H].

    Returns (hs [T, B, H], (h_T, c_T)).  Differentiable w.r.t. xw, u, h0, c0.
    """
    dt = jnp.dtype(compute_dtype)
    # Cast up front so the primal/cotangent dtypes agree with the closure.
    return _make_recurrence(dt.name)(xw.astype(dt), u, h0, c0)
