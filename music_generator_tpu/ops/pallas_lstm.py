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
tiling keeps peak VMEM bounded for arbitrarily large effective batches (the
model folds batch×notes / batch×time into this axis).

Performance notes (measured on v5e):
  * Gate math runs in the compute dtype (bfloat16 in production) — f32 gates
    double the VPU cost and dominated v1 of this kernel.
  * Only two tapes leave the kernel (h and c_prev, both in compute dtype);
    the backward kernel RECOMPUTES the gate activations from xw + h_prev@U
    instead of streaming a 4H-wide activation tape — one extra MXU matmul
    per step is far cheaper than the tape bandwidth.
  * sigmoid is computed as 0.5·tanh(0.5x)+0.5 with dtype-matched constants
    (identical function; jax.nn.sigmoid's lowering rejects bf16 here).
  * The running c stays in f32 scratch for recurrence stability; tapes are
    rounded to the compute dtype.

The pair is wrapped in a custom_vjp; training runs entirely on fused kernels.
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


def _tiling(B: int) -> Tuple[int, int]:
    # _pick_batch_tile returns a divisor of B (or B itself), so BT | B
    # always holds — the kernels rely on that invariant.
    BT = _pick_batch_tile(B)
    return BT, B // BT


def _sigmoid(x):
    """Logistic via the tanh identity, dtype-preserving (see module doc)."""
    half = jnp.asarray(0.5, x.dtype)
    return half * jnp.tanh(half * x) + half


def _hard_sigmoid(x):
    """Keras 2's hard_sigmoid: clip(0.2x + 0.5, 0, 1) — the recurrent gate
    of reference-TRAINED weights (deviation #12, docs/MIGRATION.md; the
    XLA twin is ops/lstm._keras2_hard_sigmoid)."""
    return jnp.clip(x * jnp.asarray(0.2, x.dtype) + jnp.asarray(0.5, x.dtype),
                    jnp.asarray(0.0, x.dtype), jnp.asarray(1.0, x.dtype))


def _gate_slices(z, hidden, hard: bool = False):
    act = _hard_sigmoid if hard else _sigmoid
    i = act(z[:, :hidden])
    f = act(z[:, hidden:2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden:3 * hidden])   # cell activation stays tanh
    o = act(z[:, 3 * hidden:])
    return i, f, g, o


def _gate_grad(s32, hard: bool):
    """d(gate)/dz expressed through the gate's OUTPUT s (what the tapes
    hold): s(1-s) for the logistic; 0.2 on the open unit interval for
    hard_sigmoid, 0 in saturation.  (TF's clip_by_value passes 0.2 at the
    exact ±2.5 boundary too — a measure-zero input set; the oracle tests
    draw continuous inputs so the distinction never materializes.)"""
    if hard:
        return (jnp.asarray(0.2, jnp.float32)
                * ((s32 > 0.0) & (s32 < 1.0)).astype(jnp.float32))
    return s32 * (1.0 - s32)


def _fwd_kernel(tape: bool = True, hard: bool = False):
    """Grid (NB, T): one batch tile × one timestep per invocation.  Scratch
    h_s/c_s persist across the T-innermost iterations of a tile.
    tape=False is the primal-only (eval/streaming) variant — the c_{t-1}
    backward-residual tape is neither allocated nor written (XLA cannot
    dead-code-eliminate pallas_call outputs)."""
    def kern(xw_ref, u_ref, h0_ref, c0_ref, *refs):
        if tape:
            hs_ref, cs_ref, hT_ref, cT_ref, h_s, c_s = refs
        else:
            hs_ref, hT_ref, cT_ref, h_s, c_s = refs
        t = pl.program_id(1)
        T = pl.num_programs(1)
        cdt = xw_ref.dtype

        @pl.when(t == 0)
        def _():
            h_s[:] = h0_ref[:]
            c_s[:] = c0_ref[:]

        hidden = u_ref.shape[0]
        z = (xw_ref[0]
             + jnp.dot(h_s[:].astype(cdt), u_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt))
        i, f, g, o = _gate_slices(z, hidden, hard)

        c_new = f.astype(jnp.float32) * c_s[:] + (i * g).astype(jnp.float32)
        h_new = (o.astype(jnp.float32)
                 * jnp.tanh(c_new.astype(cdt)).astype(jnp.float32))

        if tape:
            cs_ref[0] = c_s[:].astype(cdt)       # c_{t-1} tape
        hs_ref[0] = h_new.astype(cdt)
        h_s[:] = h_new
        c_s[:] = c_new

        @pl.when(t == T - 1)
        def _():
            hT_ref[:] = h_new
            cT_ref[:] = c_new

    return kern


def _bwd_kernel(hard: bool = False):
    """Grid (NB, T): step r walks t = T-1-r within each batch tile (tapes are
    pre-reversed along time).  Recomputes the gates from xw + h_prev@U, then
    carries dh/dc in scratch, accumulates dU across the whole grid, streams
    d(xw_t) out.  Terminal cotangents: dhT pre-folded into dhs[T-1]; dcT
    seeds dc_s."""
    def kern(u_ref, xw_ref, hs_prev_ref, cs_prev_ref, dhs_ref, dcT_ref,
             dxw_ref, du_ref, dh0_ref, dc0_ref,
             dh_s, dc_s, du_s):
        b = pl.program_id(0)
        NB = pl.num_programs(0)
        r = pl.program_id(1)
        T = pl.num_programs(1)
        cdt = xw_ref.dtype

        @pl.when(r == 0)
        def _():
            dh_s[:] = jnp.zeros_like(dh_s)
            dc_s[:] = dcT_ref[:]

        @pl.when((r == 0) & (b == 0))
        def _():
            du_s[:] = jnp.zeros_like(du_s)

        hidden = u_ref.shape[0]
        h_prev = hs_prev_ref[0]
        # Recompute the forward gates (identical formulas ⇒ identical
        # values).
        z = (xw_ref[0]
             + jnp.dot(h_prev, u_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt))
        i, f, g, o = _gate_slices(z, hidden, hard)
        c_prev = cs_prev_ref[0].astype(jnp.float32)

        c_new = f.astype(jnp.float32) * c_prev + (i * g).astype(jnp.float32)
        tanh_c = jnp.tanh(c_new.astype(cdt)).astype(jnp.float32)

        i32, f32_, g32, o32 = (i.astype(jnp.float32), f.astype(jnp.float32),
                               g.astype(jnp.float32), o.astype(jnp.float32))

        dh = dh_s[:] + dhs_ref[0].astype(jnp.float32)
        do = dh * tanh_c
        dc = dc_s[:] + dh * o32 * (1.0 - tanh_c * tanh_c)
        di = dc * g32
        df = dc * c_prev
        dg = dc * i32

        dz = jnp.concatenate([
            di * _gate_grad(i32, hard),
            df * _gate_grad(f32_, hard),
            dg * (1.0 - g32 * g32),
            do * _gate_grad(o32, hard),
        ], axis=-1)

        dzc = dz.astype(cdt)
        dxw_ref[0] = dzc
        # dU += h_{t-1}^T @ dz ; dh_{t-1} = dz @ U^T
        du_s[:] += jnp.dot(h_prev.T, dzc,
                           preferred_element_type=jnp.float32)
        dh_prev = jnp.dot(dzc, u_ref[:].T,
                          preferred_element_type=jnp.float32)

        dh_s[:] = dh_prev
        dc_s[:] = dc * f32_

        @pl.when(r == T - 1)
        def _():
            dh0_ref[:] = dh_prev
            dc0_ref[:] = (dc * f32_)

        @pl.when((r == T - 1) & (b == NB - 1))
        def _():
            du_ref[:] = du_s[:]

    return kern


def _forward_impl(xw, u, h0, c0, compute_dtype, tape: bool = True,
                  hard: bool = False):
    T, B, H4 = xw.shape
    H = H4 // 4
    f32 = jnp.float32
    cdt = compute_dtype
    BT, NB = _tiling(B)

    tape_spec = pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _fwd_kernel(tape, hard),
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
        out_specs=([tape_spec] * (2 if tape else 1)) + [
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), cdt)  # h tape [+ c tape]
                   for _ in range(2 if tape else 1)] + [
            jax.ShapeDtypeStruct((B, H), f32),      # h_T
            jax.ShapeDtypeStruct((B, H), f32),      # c_T
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), f32),
            pltpu.VMEM((BT, H), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H4 + 10 * T * B * H4,
            bytes_accessed=(xw.size * xw.dtype.itemsize
                            + 2 * T * B * H * jnp.dtype(cdt).itemsize),
            transcendentals=5 * T * B * H4,
        ),
    )(xw.astype(cdt), u.astype(cdt), h0.astype(f32), c0.astype(f32))
    if tape:
        hs, cs_prev, hT, cT = outs
    else:
        hs, hT, cT = outs
        cs_prev = None
    return hs, cs_prev, hT, cT


def _fwd_rule(xw, u, h0, c0, compute_dtype, hard):
    xw = xw.astype(compute_dtype)
    hs, cs_prev, hT, cT = _forward_impl(xw, u, h0, c0, compute_dtype,
                                        hard=hard)
    residuals = (u, xw, cs_prev, hs, h0)
    # hs stays in the compute dtype: downstream inter-layer ops (dropout,
    # style add) run at half the HBM traffic, and the next layer's matmul
    # casts to the compute dtype anyway.
    return (hs, (hT, cT)), residuals


def _bwd_rule(compute_dtype, hard, residuals, grads):
    u, xw, cs_prev, hs, h0 = residuals
    dhs, (dhT, dcT) = grads
    T, B, H = hs.shape
    H4 = 4 * H
    f32 = jnp.float32
    cdt = compute_dtype
    BT, NB = _tiling(B)

    # Fold terminal cotangents into the recurrence: dhT joins the last step's
    # streamed cotangent; dcT seeds the dc carry inside the kernel.
    dhs = dhs.astype(f32).at[T - 1].add(dhT.astype(f32))
    dcT = dcT.astype(f32)

    # h_{t-1} tape: shift hs right by one, h_{-1} = h0.
    hs_prev = jnp.concatenate([h0[None].astype(cdt), hs[:-1]], axis=0)

    # Reverse along time so grid index r maps to t = T-1-r with plain forward
    # block indexing.
    rev = lambda a: jnp.flip(a, axis=0)

    dxw_rev, du, dh0, dc0 = pl.pallas_call(
        _bwd_kernel(hard),
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
            jax.ShapeDtypeStruct((T, B, H4), cdt),
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
            flops=6 * T * B * H * H4 + 30 * T * B * H4,
            bytes_accessed=2 * T * B * H4 * jnp.dtype(cdt).itemsize,
            transcendentals=7 * T * B * H4,
        ),
    )(u.astype(cdt), rev(xw), rev(hs_prev), rev(cs_prev), rev(dhs), dcT)

    dxw = jnp.flip(dxw_rev, axis=0)
    return dxw.astype(cdt), du.astype(u.dtype), dh0, dc0


@functools.lru_cache(maxsize=None)
def _make_recurrence(dtype_name: str, hard: bool = False):
    """Build (and cache) the custom-VJP'd recurrence closed over the compute
    dtype and gate flavor — static config as closure, arrays as
    arguments."""
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def recurrence(xw, u, h0, c0):
        # Primal-only (eval/streaming) call: skip the c_{t-1} tape.
        hs, _, hT, cT = _forward_impl(xw, u, h0, c0, compute_dtype,
                                      tape=False, hard=hard)
        return hs, (hT, cT)

    def fwd_rule(xw, u, h0, c0):
        return _fwd_rule(xw, u, h0, c0, compute_dtype, hard)

    def bwd_rule(residuals, grads):
        return _bwd_rule(compute_dtype, hard, residuals, grads)

    recurrence.defvjp(fwd_rule, bwd_rule)
    return recurrence


def pallas_lstm_recurrence(xw, u, h0, c0, compute_dtype=jnp.float32,
                           recurrent_activation: str = "sigmoid"):
    """Fused recurrence: xw [T, B, 4H] (= x@W + b), u [H, 4H], h0/c0 [B, H].

    Returns (hs [T, B, H] in compute_dtype, (h_T, c_T) float32).
    Differentiable w.r.t. xw, u, h0, c0.  recurrent_activation
    "hard_sigmoid" runs Keras 2's clipped gates fused (deviation #12).
    """
    dt = jnp.dtype(compute_dtype)
    # Cast up front so the primal/cotangent dtypes agree with the closure.
    return _make_recurrence(dt.name,
                            recurrent_activation == "hard_sigmoid")(
        xw.astype(dt), u, h0, c0)
