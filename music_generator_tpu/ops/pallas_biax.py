"""Fused biaxial DeepJ stack kernels, v3 (training fast path).

Round-1's fused two-layer LSTM stack (ops/pallas_lstm2.py) left ~17% of the
step outside the kernels: the per-site dropout passes (mask residual traffic
measured at 9.8 ms of a 59 ms step), the style-term broadcasts (a
[T, B·N, 4H]-scale stream per layer), the inter-stack relayout + concat, and
the output heads.  v3 moves ALL of it on-chip:

  * One canonical internal layout [scan, across, B, feat] shared by both
    axes — time axis scans T with rows (n, b); note axis scans N with rows
    (t, b).  The time stack's hs1 tape IS the note stack's input stream:
    the [B,T,N,·]↔[N,B,T,·] relayout between the axes is gone.
  * Style terms stream UNbroadcast ([S_or_A, B, F] — KBs instead of the
    full-rank broadcast), added on-chip; their reference-semantics
    per-element dropout masks (ref: model.py:77-82,110-117 — Dropout after
    RepeatVector) are generated in-kernel with the hardware PRNG and
    REGENERATED in the backward: no mask residuals ever touch HBM.
  * The note stack applies the time stack's output dropout (tdrop1) to its
    input on read, concatenates the shift-chosen conditioning on-chip,
    applies the final dropout (ndrop1), and computes both output heads —
    sigmoid(play, replay) and linear volume — inside the kernel, including
    their weight gradients in the backward.
  * Backward kernels read the tapes through REVERSED index maps — the
    jnp.flip prologue copies of the v2 design (~1.6 GB/step) are gone.

Masks are seeded per (site, tile, scan-step); forward and backward share the
tiling helper so regenerated masks match exactly (the round-1 lesson).
Correctness: interpret-mode equivalence vs the unfused path at p=0, a
mask-dump sibling kernel that lets plain JAX replicate p>0 exactly, and
gradient tests against jax.grad of that reference (tests/test_pallas_biax.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.pallas_lstm import _gate_slices, _sigmoid
from music_generator_tpu.ops.pallas_lstm2 import _cell_bwd


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

# Dropout-site salts (distinct streams per site within one kernel call).
S_IN = 0        # input stream mask (tdrop1 applied by the note stack)
S_STYLE0 = 1
S_STYLE1 = 2
S_MID = 3       # inter-layer dropout (tdrop0 / ndrop0)
S_OUT = 4       # output dropout (ndrop1, note stack only)


# --- ceiling-probe knobs (tools/tpu_probe_ceiling.py) ----------------------
# Production values below; the probe overrides them (then clears the
# lru/jit caches) to price grid-invocation overhead and transcendental
# headroom on the chip — the measurements behind docs/PERFORMANCE.md's
# "Where the remaining 48.6 ms goes".  Read at trace time.
MAX_TILE_ROWS = 256   # _row_tiling row cap; halving it doubles invocations
HARD_GATES = False    # clip-based gate nonlinearities (probe only — NOT an
                      # LSTM; times the VPU transcendental budget)


def _gates(z, hidden, hard=False):
    if HARD_GATES:
        def hs(v):
            return jnp.clip(v * jnp.asarray(0.25, v.dtype)
                            + jnp.asarray(0.5, v.dtype), 0.0, 1.0)
        return (hs(z[:, :hidden]), hs(z[:, hidden:2 * hidden]),
                jnp.clip(z[:, 2 * hidden:3 * hidden], -1.0, 1.0),
                hs(z[:, 3 * hidden:]))
    # hard=True: REAL Keras-2 hard_sigmoid gates (deviation #12) — unlike
    # the HARD_GATES probe knob above, the cell activation stays tanh.
    return _gate_slices(z, hidden, hard)


def _tanh(x):
    return jnp.clip(x, -1.0, 1.0) if HARD_GATES else jnp.tanh(x)


def _row_tiling(A: int, B: int, max_rows: int = 0) -> Tuple[int, int]:
    """Tile the (across, batch) row space as (k, B) blocks: k whole
    `across` slices per tile so the [S_or_A, B, F] style streams broadcast
    cleanly on-chip.  Returns (k, A // k).  Shared by forward and backward
    (mask regeneration requires identical tiling).  max_rows=0 → the
    MAX_TILE_ROWS module knob (256 in production)."""
    max_rows = max_rows or MAX_TILE_ROWS
    if B >= max_rows:
        return 1, A
    best = 1
    for k in range(1, A + 1):
        if A % k == 0 and k * B <= max_rows:
            best = k
    return best, A // best


def _mask(seed_ref, site: int, j, s, shape, keep_prob: float, dtype):
    """Deterministic per-(site, tile, scan-step) keep-mask, scaled 1/keep.
    None when dropout is off.

    Bits come from a stateless per-element integer hash (Murmur3-style
    finalizer over element index ⊕ a (seed, site, tile, step) base) rather
    than the hardware PRNG: the same few VPU ops produce IDENTICAL bits in
    compiled AND interpret mode (the interpreter stubs prng_random_bits to
    zeros), so the p>0 gradient path is testable on CPU and the training
    dropout stream is platform-independent."""
    if keep_prob >= 1.0:
        return None
    R, W = shape
    seed = seed_ref[0, 0].astype(jnp.uint32)
    base = (seed * jnp.uint32(0x9E3779B1)
            ^ (jnp.uint32(site * 0x85EBCA77 & 0xFFFFFFFF))
            ^ (j.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
            ^ (s.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)))
    rows = jax.lax.broadcasted_iota(jnp.uint32, (R, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (R, W), 1)
    x = (rows * jnp.uint32(W) + cols) + base
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(int((1.0 - keep_prob) * 0xFFFFFFFF))
    keep = x >= threshold
    return keep.astype(dtype) * jnp.asarray(1.0 / keep_prob, dtype)


def _cell_fwd(z_in, h_prev_f32, c_prev_f32, u_ref, cdt, hidden,
              hard=False):
    z = (z_in + jnp.dot(h_prev_f32.astype(cdt), u_ref[:],
                        preferred_element_type=jnp.float32).astype(cdt))
    i, f, g, o = _gates(z, hidden, hard)
    c_new = f.astype(jnp.float32) * c_prev_f32 + (i * g).astype(jnp.float32)
    h_new = (o.astype(jnp.float32)
             * _tanh(c_new.astype(cdt)).astype(jnp.float32))
    return h_new, c_new


def _cell_recompute(z_in, h_prev, c_prev_f32, u_ref, cdt, hidden,
                    hard=False):
    z = (z_in + jnp.dot(h_prev, u_ref[:],
                        preferred_element_type=jnp.float32).astype(cdt))
    i, f, g, o = _gates(z, hidden, hard)
    c_new = f.astype(jnp.float32) * c_prev_f32 + (i * g).astype(jnp.float32)
    tanh_c = _tanh(c_new.astype(cdt)).astype(jnp.float32)
    return i, f, g, o, tanh_c


def _bcast_rows(block, k: int, B: int, F: int):
    """[B, F] or [k·B?, F]-shaped style block → (k·B, F) rows (repeat each
    B-row group k times: rows are (a, b) with b fastest)."""
    return jnp.broadcast_to(block.reshape(1, B, F), (k, B, F)).reshape(
        k * B, F)


# ---------------------------------------------------------------------------
# TIME stack: scan T, rows (n, b).  x [T, N, B, F], s0 [T, B, F],
# s1 [T, B, H] → hs1 [T, N, B, H]
# ---------------------------------------------------------------------------

def _time_fwd_kernel(keep_prob: float, k: int, B: int, dump: bool,
                     tapes: bool = True, hard: bool = False):
    def kern(seed_ref, x_ref, s0_ref, s1_ref, w0_ref, b0_ref, b1_ref,
             u0_ref, w1_ref, u1_ref,
             *refs):
        if dump:
            (hs0_ref, cs0_ref, hs1_ref, cs1_ref,
             m0_ref, m1_ref, mmid_ref,
             h0_s, c0_s, h1_s, c1_s) = refs
        elif tapes:
            (hs0_ref, cs0_ref, hs1_ref, cs1_ref,
             h0_s, c0_s, h1_s, c1_s) = refs
        else:
            # Primal-only (eval) variant: no backward-residual tapes —
            # XLA cannot dead-code-eliminate pallas_call outputs, so an
            # undifferentiated call would otherwise stream 3·T·N·B·H of
            # useless HBM writes.
            (hs1_ref, h0_s, c0_s, h1_s, c1_s) = refs
            hs0_ref = cs0_ref = cs1_ref = None
        j = pl.program_id(0)
        t = pl.program_id(1)
        cdt = x_ref.dtype
        hidden = u0_ref.shape[0]
        F = x_ref.shape[-1]
        R = k * B

        @pl.when(t == 0)
        def _():
            h0_s[:] = jnp.zeros_like(h0_s)
            c0_s[:] = jnp.zeros_like(c0_s)
            h1_s[:] = jnp.zeros_like(h1_s)
            c1_s[:] = jnp.zeros_like(c1_s)

        x = x_ref[0].reshape(R, F)
        s0 = _bcast_rows(s0_ref[0], k, B, F)
        m0 = _mask(seed_ref, S_STYLE0, j, t, (R, F), keep_prob, cdt)
        x = x + (s0 * m0 if m0 is not None else s0)

        xw0 = (jnp.dot(x, w0_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)
               + b0_ref[:].astype(cdt))
        h0_new, c0_new = _cell_fwd(xw0, h0_s[:], c0_s[:], u0_ref, cdt, hidden, hard)
        if hs0_ref is not None:
            cs0_ref[0] = c0_s[:].astype(cdt).reshape(k, B, hidden)
            hs0_ref[0] = h0_new.astype(cdt).reshape(k, B, hidden)

        x1 = h0_new.astype(cdt)
        mmid = _mask(seed_ref, S_MID, j, t, x1.shape, keep_prob, cdt)
        if mmid is not None:
            x1 = x1 * mmid
        s1 = _bcast_rows(s1_ref[0], k, B, hidden)
        m1 = _mask(seed_ref, S_STYLE1, j, t, (R, hidden), keep_prob, cdt)
        x1 = x1 + (s1 * m1 if m1 is not None else s1)

        xw1 = (jnp.dot(x1, w1_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)
               + b1_ref[:].astype(cdt))
        h1_new, c1_new = _cell_fwd(xw1, h1_s[:], c1_s[:], u1_ref, cdt, hidden, hard)
        if cs1_ref is not None:
            cs1_ref[0] = c1_s[:].astype(cdt).reshape(k, B, hidden)
        hs1_ref[0] = h1_new.astype(cdt).reshape(k, B, hidden)

        if dump:
            one = jnp.ones((R, F), cdt)
            oneH = jnp.ones((R, hidden), cdt)
            m0_ref[0] = (m0 if m0 is not None else one).reshape(k, B, F)
            m1_ref[0] = (m1 if m1 is not None else oneH).reshape(k, B, hidden)
            mmid_ref[0] = (mmid if mmid is not None else oneH).reshape(
                k, B, hidden)

        h0_s[:] = h0_new
        c0_s[:] = c0_new
        h1_s[:] = h1_new
        c1_s[:] = c1_new

    return kern


def _time_bwd_kernel(keep_prob: float, k: int, B: int,
                     hard: bool = False):
    def kern(seed_ref, x_ref, s0_ref, s1_ref, w0_ref, b0_ref, b1_ref,
             u0_ref, w1_ref, u1_ref,
             hs0p_ref, cs0p_ref, hs1p_ref, cs1p_ref, hs0_ref,
             dhs1_ref,
             dx_ref, ds0_ref, ds1_ref,
             dw0_ref, db0_ref, du0_ref, dw1_ref, du1_ref, db1_ref,
             dh0_s, dc0_s, dh1_s, dc1_s,
             dw0_s, db0_s, du0_s, dw1_s, du1_s, db1_s):
        j = pl.program_id(0)
        NJ = pl.num_programs(0)
        r = pl.program_id(1)
        T = pl.num_programs(1)
        t = T - 1 - r                      # forward step (reversed maps)
        cdt = x_ref.dtype
        hidden = u0_ref.shape[0]
        F = x_ref.shape[-1]
        R = k * B

        @pl.when(r == 0)
        def _():
            dh0_s[:] = jnp.zeros_like(dh0_s)
            dc0_s[:] = jnp.zeros_like(dc0_s)
            dh1_s[:] = jnp.zeros_like(dh1_s)
            dc1_s[:] = jnp.zeros_like(dc1_s)

        @pl.when((r == 0) & (j == 0))
        def _():
            dw0_s[:] = jnp.zeros_like(dw0_s)
            db0_s[:] = jnp.zeros_like(db0_s)
            du0_s[:] = jnp.zeros_like(du0_s)
            dw1_s[:] = jnp.zeros_like(dw1_s)
            du1_s[:] = jnp.zeros_like(du1_s)
            db1_s[:] = jnp.zeros_like(db1_s)

        # Recompute forward quantities at step t.  The prev-h tapes stream
        # through clamped index maps (block max(t-1, 0)); zero them at t=0
        # instead of materializing shifted copies.
        notfirst = jnp.where(t == 0, jnp.float32(0), jnp.float32(1))
        x_raw = x_ref[0].reshape(R, F)
        s0 = _bcast_rows(s0_ref[0], k, B, F)
        m0 = _mask(seed_ref, S_STYLE0, j, t, (R, F), keep_prob, cdt)
        x = x_raw + (s0 * m0 if m0 is not None else s0)
        h0_prev = (hs0p_ref[0].reshape(R, hidden).astype(jnp.float32)
                   * notfirst).astype(cdt)
        c0_prev = cs0p_ref[0].reshape(R, hidden).astype(jnp.float32)
        h1_prev = (hs1p_ref[0].reshape(R, hidden).astype(jnp.float32)
                   * notfirst).astype(cdt)
        c1_prev = cs1p_ref[0].reshape(R, hidden).astype(jnp.float32)
        h0 = hs0_ref[0].reshape(R, hidden)

        xw0 = (jnp.dot(x, w0_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)
               + b0_ref[:].astype(cdt))
        i0, f0, g0, o0, tanh_c0 = _cell_recompute(
            xw0, h0_prev, c0_prev, u0_ref, cdt, hidden, hard)

        mmid = _mask(seed_ref, S_MID, j, t, (R, hidden), keep_prob, cdt)
        x1m = h0 * mmid if mmid is not None else h0
        s1 = _bcast_rows(s1_ref[0], k, B, hidden)
        m1 = _mask(seed_ref, S_STYLE1, j, t, (R, hidden), keep_prob, cdt)
        x1 = x1m + (s1 * m1 if m1 is not None else s1)
        xw1 = (jnp.dot(x1, w1_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)
               + b1_ref[:].astype(cdt))
        i1, f1, g1, o1, tanh_c1 = _cell_recompute(
            xw1, h1_prev, c1_prev, u1_ref, cdt, hidden, hard)

        # Layer 1 backward.
        dh1 = dh1_s[:] + dhs1_ref[0].reshape(R, hidden).astype(jnp.float32)
        dz1, dc1_prev, dh1_prev = _cell_bwd(
            i1, f1, g1, o1, c1_prev, tanh_c1, dh1, dc1_s[:], u1_ref, cdt,
            hard)
        du1_s[:] += jnp.dot(h1_prev.T, dz1, preferred_element_type=jnp.float32)
        db1_s[:] += jnp.sum(dz1.astype(jnp.float32), axis=0, keepdims=True)
        dw1_s[:] += jnp.dot(x1.T, dz1, preferred_element_type=jnp.float32)
        dx1 = jnp.dot(dz1, w1_ref[:].T, preferred_element_type=jnp.float32)

        # ds1 accumulates over the across-tiles of this j... across j? ds1
        # varies per (t, b): sum over the k across-rows of this tile AND
        # over tiles j.  Tile sum here; cross-tile sum outside (output is
        # per-j, reduced by the host wrapper).
        ds1_rows = dx1 * m1.astype(jnp.float32) if m1 is not None else dx1
        ds1_ref[0, 0] = jnp.sum(ds1_rows.reshape(k, B, hidden),
                                axis=0).astype(cdt)
        dh0 = dh0_s[:] + (dx1 * mmid.astype(jnp.float32)
                          if mmid is not None else dx1)

        # Layer 0 backward.
        dz0, dc0_prev, dh0_prev = _cell_bwd(
            i0, f0, g0, o0, c0_prev, tanh_c0, dh0, dc0_s[:], u0_ref, cdt,
            hard)
        dw0_s[:] += jnp.dot(x.T, dz0, preferred_element_type=jnp.float32)
        db0_s[:] += jnp.sum(dz0.astype(jnp.float32), axis=0, keepdims=True)
        du0_s[:] += jnp.dot(h0_prev.T, dz0, preferred_element_type=jnp.float32)
        dx = jnp.dot(dz0, w0_ref[:].T, preferred_element_type=jnp.float32)
        dx_ref[0] = dx.astype(cdt).reshape(k, B, F)
        ds0_rows = dx * m0.astype(jnp.float32) if m0 is not None else dx
        ds0_ref[0, 0] = jnp.sum(ds0_rows.reshape(k, B, F), axis=0).astype(cdt)

        dh0_s[:] = dh0_prev
        dc0_s[:] = dc0_prev
        dh1_s[:] = dh1_prev
        dc1_s[:] = dc1_prev

        @pl.when((r == T - 1) & (j == NJ - 1))
        def _():
            dw0_ref[:] = dw0_s[:]
            db0_ref[:] = db0_s[:]
            du0_ref[:] = du0_s[:]
            dw1_ref[:] = dw1_s[:]
            du1_ref[:] = du1_s[:]
            db1_ref[:] = db1_s[:]

    return kern


def _time_fwd_impl(x, s0, s1, w0, b0, b1, u0, w1, u1, seed, keep_prob,
                   compute_dtype, dump=False, tapes=True, hard=False):
    T, N, B, F = x.shape
    H4 = u0.shape[1]
    H = H4 // 4
    f32 = jnp.float32
    cdt = compute_dtype
    k, NJ = _row_tiling(N, B)

    tape = lambda: pl.BlockSpec((1, k, B, H), lambda j, t: (t, j, 0, 0),
                                memory_space=pltpu.VMEM)
    # Full outputs: (hs0, cs0, hs1, cs1); primal-only (tapes=False): (hs1,).
    n_out = 4 if (tapes or dump) else 1
    out_shapes = [jax.ShapeDtypeStruct((T, N, B, H), cdt)
                  for _ in range(n_out)]
    out_specs = [tape() for _ in range(n_out)]
    if dump:
        out_shapes += [jax.ShapeDtypeStruct((T, N, B, F), cdt),
                       jax.ShapeDtypeStruct((T, N, B, H), cdt),
                       jax.ShapeDtypeStruct((T, N, B, H), cdt)]
        out_specs += [pl.BlockSpec((1, k, B, F), lambda j, t: (t, j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      tape(), tape()]

    outs = pl.pallas_call(
        _time_fwd_kernel(keep_prob, k, B, dump, tapes, hard),
        grid=(NJ, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
            pl.BlockSpec((1, k, B, F), lambda j, t: (t, j, 0, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((1, B, F), lambda j, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # s0
            pl.BlockSpec((1, B, H), lambda j, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # s1
            pl.BlockSpec((F, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((k * B, H), f32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * B * (F + 3 * H) * H4 + 20 * T * N * B * H4,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + 4 * T * N * B * H * jnp.dtype(cdt).itemsize),
            transcendentals=10 * T * N * B * H4,
        ),
    )(seed, x.astype(cdt), s0.astype(cdt), s1.astype(cdt),
      w0.astype(cdt), b0.reshape(1, H4).astype(f32),
      b1.reshape(1, H4).astype(f32),
      u0.astype(cdt), w1.astype(cdt), u1.astype(cdt))
    return outs


def _time_bwd_impl(residuals, dhs1, keep_prob, compute_dtype, hard=False):
    (x, s0, s1, w0, b0, b1, u0, w1, u1, seed, hs0, cs0, hs1, cs1) = residuals
    T, N, B, F = x.shape
    H4 = u0.shape[1]
    H = H4 // 4
    f32 = jnp.float32
    cdt = compute_dtype
    k, NJ = _row_tiling(N, B)

    # Reversed-time index maps: block t_fwd = T-1-r — no flip copies.  The
    # prev-h streams read the SAME tapes at block max(t_fwd - 1, 0); the
    # kernel zeroes them at t_fwd = 0 (no shifted-copy prologue).
    rev4 = lambda width: pl.BlockSpec(
        (1, k, B, width), lambda j, r: (T - 1 - r, j, 0, 0),
        memory_space=pltpu.VMEM)
    rev_s = lambda width: pl.BlockSpec(
        (1, B, width), lambda j, r: (T - 1 - r, 0, 0),
        memory_space=pltpu.VMEM)
    revp = lambda width: pl.BlockSpec(
        (1, k, B, width),
        lambda j, r: (jnp.maximum(T - 2 - r, 0), j, 0, 0),
        memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _time_bwd_kernel(keep_prob, k, B, hard),
        grid=(NJ, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
            rev4(F),                                        # x
            rev_s(F),                                       # s0
            rev_s(H),                                       # s1
            pl.BlockSpec((F, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            revp(H), rev4(H), revp(H), rev4(H),             # hs0p cs0 hs1p cs1
            rev4(H),                                        # hs0
            rev4(H),                                        # dhs1
        ],
        out_specs=[
            rev4(F),                                        # dx
            # ds0/ds1: per-(tile j, t) partials, summed over j outside.
            pl.BlockSpec((1, 1, B, F),
                         lambda j, r: (j, T - 1 - r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B, H),
                         lambda j, r: (j, T - 1 - r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda j, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, B, F), cdt),        # dx
            jax.ShapeDtypeStruct((NJ, T, B, F), cdt),       # ds0 partials
            jax.ShapeDtypeStruct((NJ, T, B, H), cdt),       # ds1 partials
            jax.ShapeDtypeStruct((F, H4), f32),
            jax.ShapeDtypeStruct((1, H4), f32),
            jax.ShapeDtypeStruct((H, H4), f32),
            jax.ShapeDtypeStruct((H, H4), f32),
            jax.ShapeDtypeStruct((H, H4), f32),
            jax.ShapeDtypeStruct((1, H4), f32),
        ],
        scratch_shapes=([pltpu.VMEM((k * B, H), f32) for _ in range(4)]
                        + [pltpu.VMEM((F, H4), f32),
                           pltpu.VMEM((1, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((1, H4), f32)]),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * N * B * (F + 3 * H) * H4 + 40 * T * N * B * H4,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=10 * T * N * B * H4,
        ),
    )(seed, x.astype(cdt), s0.astype(cdt), s1.astype(cdt),
      w0.astype(cdt), b0.reshape(1, H4).astype(f32),
      b1.reshape(1, H4).astype(f32),
      u0.astype(cdt), w1.astype(cdt), u1.astype(cdt),
      hs0, cs0, hs1, cs1, hs0, dhs1.astype(cdt))

    (dx, ds0p, ds1p, dw0, db0, du0, dw1, du1, db1) = outs
    ds0 = jnp.sum(ds0p.astype(f32), axis=0)
    ds1 = jnp.sum(ds1p.astype(f32), axis=0)
    return (dx, ds0, ds1, dw0, db0.reshape(H4), db1.reshape(H4),
            du0, dw1, du1)


@functools.lru_cache(maxsize=None)
def _make_time_stack(dtype_name: str, keep_prob: float,
                     hard: bool = False):
    cdt = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def stack(x, s0, s1, w0, b0, b1, u0, w1, u1, seed):
        # Primal-only (eval) call: skip the backward-residual tapes.
        outs = _time_fwd_impl(x, s0, s1, w0, b0, b1, u0, w1, u1, seed,
                              keep_prob, cdt, tapes=False, hard=hard)
        return outs[0]                                    # hs1

    def fwd_rule(x, s0, s1, w0, b0, b1, u0, w1, u1, seed):
        hs0, cs0, hs1, cs1 = _time_fwd_impl(
            x, s0, s1, w0, b0, b1, u0, w1, u1, seed, keep_prob, cdt,
            hard=hard)
        return hs1, (x, s0, s1, w0, b0, b1, u0, w1, u1, seed,
                     hs0, cs0, hs1, cs1)

    def bwd_rule(residuals, dhs1):
        import numpy as _np
        (dx, ds0, ds1, dw0, db0, db1, du0, dw1, du1) = _time_bwd_impl(
            residuals, dhs1, keep_prob, cdt, hard)
        # Cotangent dtypes must match the primals (style streams may be
        # bf16 while the kernel accumulates their grads in f32).
        ds0 = ds0.astype(residuals[1].dtype)
        ds1 = ds1.astype(residuals[2].dtype)
        dseed = _np.zeros((1, 1), jax.dtypes.float0)
        return (dx, ds0, ds1, dw0, db0, db1, du0, dw1, du1, dseed)

    stack.defvjp(fwd_rule, bwd_rule)
    return stack


def biax_time_stack(x, s0, s1, w0, b0, b1, u0, w1, u1,
                    dropout_p: float = 0.0, seed: int = 0,
                    compute_dtype=jnp.float32,
                    recurrent_activation: str = "sigmoid"):
    """Time-axis fused stack v3.

    x:  [T, N, B, F]  raw per-note features (time-major, note-sorted).
    s0: [T, B, F]     tanh(style proj, layer 0), UNmasked/UNbroadcast.
    s1: [T, B, H]     tanh(style proj, layer 1).
    Returns hs1 [T, N, B, H] (compute dtype) — fed straight to
    biax_note_stack with no relayout.  Style dropout masks (per-element,
    ref semantics) and the inter-layer dropout run in-kernel.
    """
    dt = jnp.dtype(compute_dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    stack = _make_time_stack(dt.name, float(1.0 - dropout_p),
                             recurrent_activation == "hard_sigmoid")
    return stack(x.astype(dt), s0, s1, w0, b0.reshape(-1), b1.reshape(-1),
                 u0, w1, u1, seed_arr)


def time_stack_dump_masks(x, s0, s1, w0, b0, b1, u0, w1, u1,
                          dropout_p: float, seed: int,
                          compute_dtype=jnp.float32):
    """Test-only sibling: same forward, also returns the in-kernel masks
    (m_style0 [T,N,B,F], m_style1 [T,N,B,H], m_mid [T,N,B,H]) so plain JAX
    can replicate the p>0 forward/backward exactly."""
    dt = jnp.dtype(compute_dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    outs = _time_fwd_impl(x.astype(dt), s0, s1, w0, b0.reshape(-1),
                          b1.reshape(-1), u0, w1, u1, seed_arr,
                          float(1.0 - dropout_p), dt, dump=True)
    hs0, cs0, hs1, cs1, m0, m1, mmid = outs
    return hs1, (m0, m1, mmid)


# ---------------------------------------------------------------------------
# NOTE stack: scan N (pitch), rows (t, b).  ht [T, N, B, Ht] (the time
# stack's output, read through the input-dropout mask), chosen [N, T, B, C],
# style streams [T, B, ·] → out [N, T, B, 3] (heads fused).
# ---------------------------------------------------------------------------

S_STYLE0C = 5   # style-0 mask stream over the chosen-feature columns


def _note_fwd_kernel(keep_prob: float, k: int, B: int, dump: bool,
                     tapes: bool = True, hard: bool = False):
    def kern(seed_ref, ht_ref, ch_ref, s0t_ref, s0c_ref, s1_ref,
             w0t_ref, w0c_ref, b0_ref, b1_ref, u0_ref, w1_ref, u1_ref,
             wh_ref, bh_ref,
             *refs):
        if dump:
            (out_ref, hs0_ref, cs0_ref, hs1_ref, cs1_ref,
             min_ref, m0t_ref, m0c_ref, m1_ref, mmid_ref, mout_ref,
             h0_s, c0_s, h1_s, c1_s) = refs
        elif tapes:
            (out_ref, hs0_ref, cs0_ref, hs1_ref, cs1_ref,
             h0_s, c0_s, h1_s, c1_s) = refs
        else:
            # Primal-only (eval) variant: no backward-residual tapes (see
            # _time_fwd_kernel — 4·N·T·B·H of HBM writes otherwise).
            (out_ref, h0_s, c0_s, h1_s, c1_s) = refs
            hs0_ref = cs0_ref = hs1_ref = cs1_ref = None
        j = pl.program_id(0)
        n = pl.program_id(1)
        cdt = ht_ref.dtype
        hidden = u0_ref.shape[0]
        Ht = ht_ref.shape[-1]
        C = ch_ref.shape[-1]
        R = k * B

        @pl.when(n == 0)
        def _():
            h0_s[:] = jnp.zeros_like(h0_s)
            c0_s[:] = jnp.zeros_like(c0_s)
            h1_s[:] = jnp.zeros_like(h1_s)
            c1_s[:] = jnp.zeros_like(c1_s)

        xt = ht_ref[:, 0].reshape(R, Ht)
        m_in = _mask(seed_ref, S_IN, j, n, (R, Ht), keep_prob, cdt)
        if m_in is not None:
            xt = xt * m_in
        ch = ch_ref[0].reshape(R, C)

        s0t = s0t_ref[:].reshape(R, Ht)
        s0c = s0c_ref[:].reshape(R, C)
        m0t = _mask(seed_ref, S_STYLE0, j, n, (R, Ht), keep_prob, cdt)
        m0c = _mask(seed_ref, S_STYLE0C, j, n, (R, C), keep_prob, cdt)
        xt_tot = xt + (s0t * m0t if m0t is not None else s0t)
        ch_tot = ch + (s0c * m0c if m0c is not None else s0c)

        # Split input projection — no on-chip concat needed.
        xw0 = (jnp.dot(xt_tot, w0t_ref[:],
                       preferred_element_type=jnp.float32)
               + jnp.dot(ch_tot, w0c_ref[:],
                         preferred_element_type=jnp.float32)).astype(cdt)
        xw0 = xw0 + b0_ref[:].astype(cdt)
        h0_new, c0_new = _cell_fwd(xw0, h0_s[:], c0_s[:], u0_ref, cdt, hidden, hard)
        if hs0_ref is not None:
            cs0_ref[0] = c0_s[:].astype(cdt).reshape(k, B, hidden)
            hs0_ref[0] = h0_new.astype(cdt).reshape(k, B, hidden)

        x1 = h0_new.astype(cdt)
        mmid = _mask(seed_ref, S_MID, j, n, x1.shape, keep_prob, cdt)
        if mmid is not None:
            x1 = x1 * mmid
        s1 = s1_ref[:].reshape(R, hidden)
        m1 = _mask(seed_ref, S_STYLE1, j, n, (R, hidden), keep_prob, cdt)
        x1 = x1 + (s1 * m1 if m1 is not None else s1)
        xw1 = (jnp.dot(x1, w1_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)
               + b1_ref[:].astype(cdt))
        h1_new, c1_new = _cell_fwd(xw1, h1_s[:], c1_s[:], u1_ref, cdt, hidden, hard)
        if hs1_ref is not None:
            cs1_ref[0] = c1_s[:].astype(cdt).reshape(k, B, hidden)
            hs1_ref[0] = h1_new.astype(cdt).reshape(k, B, hidden)

        # Output dropout + fused heads: sigmoid(play, replay) ++ volume.
        h1d = h1_new.astype(cdt)
        m_out = _mask(seed_ref, S_OUT, j, n, h1d.shape, keep_prob, cdt)
        if m_out is not None:
            h1d = h1d * m_out
        z = (jnp.dot(h1d, wh_ref[:], preferred_element_type=jnp.float32)
             + bh_ref[:].astype(jnp.float32))
        zs = _sigmoid(z[:, :2].astype(cdt)).astype(jnp.float32)
        out = jnp.concatenate([zs, z[:, 2:]], axis=-1)
        out_ref[0] = out.astype(jnp.float32).reshape(k, B, out.shape[-1])

        if dump:
            oneH = jnp.ones((R, hidden), cdt)
            oneT = jnp.ones((R, Ht), cdt)
            min_ref[0] = (m_in if m_in is not None else oneT).reshape(
                k, B, Ht)
            m0t_ref[0] = (m0t if m0t is not None else oneT).reshape(k, B, Ht)
            m0c_ref[0] = (m0c if m0c is not None
                          else jnp.ones((R, C), cdt)).reshape(k, B, C)
            m1_ref[0] = (m1 if m1 is not None else oneH).reshape(k, B, hidden)
            mmid_ref[0] = (mmid if mmid is not None else oneH).reshape(
                k, B, hidden)
            mout_ref[0] = (m_out if m_out is not None else oneH).reshape(
                k, B, hidden)

        h0_s[:] = h0_new
        c0_s[:] = c0_new
        h1_s[:] = h1_new
        c1_s[:] = c1_new

    return kern


def _note_bwd_kernel(keep_prob: float, k: int, B: int, N: int,
                     hard: bool = False):
    def kern(seed_ref, ht_ref, ch_ref, s0t_ref, s0c_ref, s1_ref,
             w0t_ref, w0c_ref, b0_ref, b1_ref, u0_ref, w1_ref, u1_ref,
             wh_ref, bh_ref,
             hs0p_ref, cs0_ref, hs1p_ref, cs1_ref, hs0_ref, hs1_ref,
             dout_ref,
             dht_ref, dch_ref, ds0t_ref, ds0c_ref, ds1_ref,
             dw0t_ref, dw0c_ref, db0_ref, du0_ref, dw1_ref, du1_ref,
             db1_ref, dwh_ref, dbh_ref,
             dh0_s, dc0_s, dh1_s, dc1_s,
             dw0t_s, dw0c_s, db0_s, du0_s, dw1_s, du1_s, db1_s,
             dwh_s, dbh_s):
        j = pl.program_id(0)
        NJ = pl.num_programs(0)
        r = pl.program_id(1)
        n = N - 1 - r                       # forward pitch index
        cdt = ht_ref.dtype
        hidden = u0_ref.shape[0]
        Ht = ht_ref.shape[-1]
        C = ch_ref.shape[-1]
        R = k * B
        f32 = jnp.float32

        @pl.when(r == 0)
        def _():
            dh0_s[:] = jnp.zeros_like(dh0_s)
            dc0_s[:] = jnp.zeros_like(dc0_s)
            dh1_s[:] = jnp.zeros_like(dh1_s)
            dc1_s[:] = jnp.zeros_like(dc1_s)
            ds0t_ref[:] = jnp.zeros_like(ds0t_ref)
            ds0c_ref[:] = jnp.zeros_like(ds0c_ref)
            ds1_ref[:] = jnp.zeros_like(ds1_ref)

        @pl.when((r == 0) & (j == 0))
        def _():
            dw0t_s[:] = jnp.zeros_like(dw0t_s)
            dw0c_s[:] = jnp.zeros_like(dw0c_s)
            db0_s[:] = jnp.zeros_like(db0_s)
            du0_s[:] = jnp.zeros_like(du0_s)
            dw1_s[:] = jnp.zeros_like(dw1_s)
            du1_s[:] = jnp.zeros_like(du1_s)
            db1_s[:] = jnp.zeros_like(db1_s)
            dwh_s[:] = jnp.zeros_like(dwh_s)
            dbh_s[:] = jnp.zeros_like(dbh_s)

        # --- recompute forward quantities at pitch n ----------------------
        # Guarded prev tapes: the n=0 block maps to index 0 (clamped);
        # zero it out so pitch 0 sees zero initial state.
        notfirst = jnp.where(n == 0, jnp.float32(0), jnp.float32(1))

        xt_raw = ht_ref[:, 0].reshape(R, Ht)
        m_in = _mask(seed_ref, S_IN, j, n, (R, Ht), keep_prob, cdt)
        xt = xt_raw * m_in if m_in is not None else xt_raw
        ch = ch_ref[0].reshape(R, C)
        s0t = s0t_ref[:].reshape(R, Ht)
        s0c = s0c_ref[:].reshape(R, C)
        m0t = _mask(seed_ref, S_STYLE0, j, n, (R, Ht), keep_prob, cdt)
        m0c = _mask(seed_ref, S_STYLE0C, j, n, (R, C), keep_prob, cdt)
        xt_tot = xt + (s0t * m0t if m0t is not None else s0t)
        ch_tot = ch + (s0c * m0c if m0c is not None else s0c)

        h0_prev = (hs0p_ref[0].reshape(R, hidden).astype(f32)
                   * notfirst).astype(cdt)
        c0_prev = cs0_ref[0].reshape(R, hidden).astype(f32)
        h1_prev = (hs1p_ref[0].reshape(R, hidden).astype(f32)
                   * notfirst).astype(cdt)
        c1_prev = cs1_ref[0].reshape(R, hidden).astype(f32)
        h0 = hs0_ref[0].reshape(R, hidden)
        h1 = hs1_ref[0].reshape(R, hidden)

        xw0 = (jnp.dot(xt_tot, w0t_ref[:], preferred_element_type=f32)
               + jnp.dot(ch_tot, w0c_ref[:],
                         preferred_element_type=f32)).astype(cdt)
        xw0 = xw0 + b0_ref[:].astype(cdt)
        i0, f0, g0, o0, tanh_c0 = _cell_recompute(
            xw0, h0_prev, c0_prev, u0_ref, cdt, hidden, hard)

        mmid = _mask(seed_ref, S_MID, j, n, (R, hidden), keep_prob, cdt)
        x1m = h0 * mmid if mmid is not None else h0
        s1 = s1_ref[:].reshape(R, hidden)
        m1 = _mask(seed_ref, S_STYLE1, j, n, (R, hidden), keep_prob, cdt)
        x1 = x1m + (s1 * m1 if m1 is not None else s1)
        xw1 = (jnp.dot(x1, w1_ref[:],
                       preferred_element_type=f32).astype(cdt)
               + b1_ref[:].astype(cdt))
        i1, f1, g1, o1, tanh_c1 = _cell_recompute(
            xw1, h1_prev, c1_prev, u1_ref, cdt, hidden, hard)

        m_out = _mask(seed_ref, S_OUT, j, n, (R, hidden), keep_prob, cdt)
        h1d = h1 * m_out if m_out is not None else h1
        z = (jnp.dot(h1d, wh_ref[:], preferred_element_type=f32)
             + bh_ref[:].astype(f32))
        sig = _sigmoid(z[:, :2].astype(cdt)).astype(f32)

        # --- heads backward -----------------------------------------------
        dout = dout_ref[0].reshape(R, z.shape[-1]).astype(f32)
        dz_head = jnp.concatenate(
            [dout[:, :2] * sig * (1.0 - sig), dout[:, 2:]], axis=-1)
        dwh_s[:] += jnp.dot(h1d.astype(f32).T, dz_head,
                            preferred_element_type=f32)
        dbh_s[:] += jnp.sum(dz_head, axis=0, keepdims=True)
        dh1d = jnp.dot(dz_head.astype(cdt), wh_ref[:].T,
                       preferred_element_type=f32)
        dh1_from_heads = (dh1d * m_out.astype(f32)
                          if m_out is not None else dh1d)

        # --- layer 1 backward ----------------------------------------------
        dh1_tot = dh1_s[:] + dh1_from_heads
        dz1, dc1_prev, dh1_prev = _cell_bwd(
            i1, f1, g1, o1, c1_prev, tanh_c1, dh1_tot, dc1_s[:], u1_ref,
            cdt, hard)
        du1_s[:] += jnp.dot(h1_prev.astype(f32).T, dz1.astype(f32),
                            preferred_element_type=f32)
        db1_s[:] += jnp.sum(dz1.astype(f32), axis=0, keepdims=True)
        dw1_s[:] += jnp.dot(x1.astype(f32).T, dz1.astype(f32),
                            preferred_element_type=f32)
        dx1 = jnp.dot(dz1, w1_ref[:].T, preferred_element_type=f32)
        ds1_ref[:] += (dx1 * m1.astype(f32) if m1 is not None
                       else dx1).astype(f32).reshape(k, B, hidden)
        dh0 = dh0_s[:] + (dx1 * mmid.astype(f32)
                          if mmid is not None else dx1)

        # --- layer 0 backward ----------------------------------------------
        dz0, dc0_prev, dh0_prev = _cell_bwd(
            i0, f0, g0, o0, c0_prev, tanh_c0, dh0, dc0_s[:], u0_ref, cdt,
            hard)
        dw0t_s[:] += jnp.dot(xt_tot.astype(f32).T, dz0.astype(f32),
                             preferred_element_type=f32)
        dw0c_s[:] += jnp.dot(ch_tot.astype(f32).T, dz0.astype(f32),
                             preferred_element_type=f32)
        db0_s[:] += jnp.sum(dz0.astype(f32), axis=0, keepdims=True)
        du0_s[:] += jnp.dot(h0_prev.astype(f32).T, dz0.astype(f32),
                            preferred_element_type=f32)
        dxt_tot = jnp.dot(dz0, w0t_ref[:].T, preferred_element_type=f32)
        dch_tot = jnp.dot(dz0, w0c_ref[:].T, preferred_element_type=f32)
        dht_ref[:, 0] = (dxt_tot * m_in.astype(f32) if m_in is not None
                         else dxt_tot).astype(cdt).reshape(k, B, Ht)
        dch_ref[0] = dch_tot.astype(cdt).reshape(k, B, C)
        ds0t_ref[:] += (dxt_tot * m0t.astype(f32) if m0t is not None
                        else dxt_tot).reshape(k, B, Ht)
        ds0c_ref[:] += (dch_tot * m0c.astype(f32) if m0c is not None
                        else dch_tot).reshape(k, B, C)

        dh0_s[:] = dh0_prev
        dc0_s[:] = dc0_prev
        dh1_s[:] = dh1_prev
        dc1_s[:] = dc1_prev

        @pl.when((r == N - 1) & (j == NJ - 1))
        def _():
            dw0t_ref[:] = dw0t_s[:]
            dw0c_ref[:] = dw0c_s[:]
            db0_ref[:] = db0_s[:]
            du0_ref[:] = du0_s[:]
            dw1_ref[:] = dw1_s[:]
            du1_ref[:] = du1_s[:]
            db1_ref[:] = db1_s[:]
            dwh_ref[:] = dwh_s[:]
            dbh_ref[:] = dbh_s[:]

    return kern


def _vm(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _note_specs(T, N, B, Ht, C, H, H4, k, fwd: bool):
    """BlockSpecs shared by the note fwd/bwd kernels.  In bwd the scan index
    is r = N-1-n (reversed maps)."""
    pitch = (lambda i: i) if fwd else (lambda i: N - 1 - i)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
        _vm((k, 1, B, Ht), lambda j, s: (j, pitch(s), 0, 0)),     # ht
        _vm((1, k, B, C), lambda j, s: (pitch(s), j, 0, 0)),      # ch
        _vm((k, B, Ht), lambda j, s: (j, 0, 0)),                  # s0t
        _vm((k, B, C), lambda j, s: (j, 0, 0)),                   # s0c
        _vm((k, B, H), lambda j, s: (j, 0, 0)),                   # s1
        _vm((Ht, H4), lambda j, s: (0, 0)),                       # w0t
        _vm((C, H4), lambda j, s: (0, 0)),                        # w0c
        _vm((1, H4), lambda j, s: (0, 0)),                        # b0
        _vm((1, H4), lambda j, s: (0, 0)),                        # b1
        _vm((H, H4), lambda j, s: (0, 0)),                        # u0
        _vm((H, H4), lambda j, s: (0, 0)),                        # w1
        _vm((H, H4), lambda j, s: (0, 0)),                        # u1
        _vm((H, 3), lambda j, s: (0, 0)),                         # whead
        _vm((1, 3), lambda j, s: (0, 0)),                         # bhead
    ]
    return in_specs


def _note_fwd_impl(ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1,
                   wh, bh, seed, keep_prob, compute_dtype, dump=False,
                   tapes=True, hard=False):
    T, N, B, Ht = ht.shape
    C = ch.shape[-1]
    H4 = u0.shape[1]
    H = H4 // 4
    f32 = jnp.float32
    cdt = compute_dtype
    k, JT = _row_tiling(T, B)

    tape = lambda: _vm((1, k, B, H), lambda j, s: (s, j, 0, 0))
    # Full outputs: out + (hs0, cs0, hs1, cs1); primal-only: out alone.
    n_tapes = 4 if (tapes or dump) else 0
    out_specs = ([_vm((1, k, B, 3), lambda j, s: (s, j, 0, 0))]   # out
                 + [tape() for _ in range(n_tapes)])
    out_shapes = [jax.ShapeDtypeStruct((N, T, B, 3), f32)] + [
        jax.ShapeDtypeStruct((N, T, B, H), cdt) for _ in range(n_tapes)]
    if dump:
        dspec = lambda w: _vm((1, k, B, w), lambda j, s: (s, j, 0, 0))
        out_specs += [dspec(Ht), dspec(Ht), dspec(C), dspec(H), dspec(H),
                      dspec(H)]
        out_shapes += [jax.ShapeDtypeStruct((N, T, B, Ht), cdt),
                       jax.ShapeDtypeStruct((N, T, B, Ht), cdt),
                       jax.ShapeDtypeStruct((N, T, B, C), cdt),
                       jax.ShapeDtypeStruct((N, T, B, H), cdt),
                       jax.ShapeDtypeStruct((N, T, B, H), cdt),
                       jax.ShapeDtypeStruct((N, T, B, H), cdt)]

    outs = pl.pallas_call(
        _note_fwd_kernel(keep_prob, k, B, dump, tapes, hard),
        grid=(JT, N),
        in_specs=_note_specs(T, N, B, Ht, C, H, H4, k, fwd=True),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((k * B, H), f32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * T * B * (Ht + C + 3 * H) * H4,
            bytes_accessed=(ht.size * ht.dtype.itemsize
                            + 4 * N * T * B * H * jnp.dtype(cdt).itemsize),
            transcendentals=10 * N * T * B * H4,
        ),
    )(seed, ht.astype(cdt), ch.astype(cdt), s0t.astype(cdt),
      s0c.astype(cdt), s1.astype(cdt),
      w0t.astype(cdt), w0c.astype(cdt),
      b0.reshape(1, H4).astype(f32), b1.reshape(1, H4).astype(f32),
      u0.astype(cdt), w1.astype(cdt), u1.astype(cdt),
      wh.astype(cdt), bh.reshape(1, 3).astype(f32))
    return outs


def _note_bwd_impl(residuals, dout, keep_prob, compute_dtype, hard=False):
    (ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1, wh, bh, seed,
     hs0, cs0, hs1, cs1) = residuals
    T, N, B, Ht = ht.shape
    C = ch.shape[-1]
    H4 = u0.shape[1]
    H = H4 // 4
    f32 = jnp.float32
    cdt = compute_dtype
    k, JT = _row_tiling(T, B)

    # Previous-pitch tapes via clamped index maps (kernel zeroes pitch 0).
    tape_prev = lambda: _vm(
        (1, k, B, H),
        lambda j, s: (jnp.maximum(N - 2 - s, 0), j, 0, 0))
    tape_rev = lambda: _vm((1, k, B, H), lambda j, s: (N - 1 - s, j, 0, 0))

    in_specs = _note_specs(T, N, B, Ht, C, H, H4, k, fwd=False) + [
        tape_prev(), tape_rev(), tape_prev(), tape_rev(),     # hs0p cs0 hs1p cs1
        tape_rev(), tape_rev(),                               # hs0, hs1
        _vm((1, k, B, 3), lambda j, s: (N - 1 - s, j, 0, 0)),  # dout
    ]
    out_specs = [
        _vm((k, 1, B, Ht), lambda j, s: (j, N - 1 - s, 0, 0)),  # dht
        _vm((1, k, B, C), lambda j, s: (N - 1 - s, j, 0, 0)),   # dch
        _vm((k, B, Ht), lambda j, s: (j, 0, 0)),                # ds0t (acc)
        _vm((k, B, C), lambda j, s: (j, 0, 0)),                 # ds0c (acc)
        _vm((k, B, H), lambda j, s: (j, 0, 0)),                 # ds1  (acc)
        _vm((Ht, H4), lambda j, s: (0, 0)),
        _vm((C, H4), lambda j, s: (0, 0)),
        _vm((1, H4), lambda j, s: (0, 0)),
        _vm((H, H4), lambda j, s: (0, 0)),
        _vm((H, H4), lambda j, s: (0, 0)),
        _vm((H, H4), lambda j, s: (0, 0)),
        _vm((1, H4), lambda j, s: (0, 0)),
        _vm((H, 3), lambda j, s: (0, 0)),
        _vm((1, 3), lambda j, s: (0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((T, N, B, Ht), cdt),               # dht
        jax.ShapeDtypeStruct((N, T, B, C), cdt),                # dch
        jax.ShapeDtypeStruct((T, B, Ht), f32),                  # ds0t
        jax.ShapeDtypeStruct((T, B, C), f32),                   # ds0c
        jax.ShapeDtypeStruct((T, B, H), f32),                   # ds1
        jax.ShapeDtypeStruct((Ht, H4), f32),
        jax.ShapeDtypeStruct((C, H4), f32),
        jax.ShapeDtypeStruct((1, H4), f32),
        jax.ShapeDtypeStruct((H, H4), f32),
        jax.ShapeDtypeStruct((H, H4), f32),
        jax.ShapeDtypeStruct((H, H4), f32),
        jax.ShapeDtypeStruct((1, H4), f32),
        jax.ShapeDtypeStruct((H, 3), f32),
        jax.ShapeDtypeStruct((1, 3), f32),
    ]

    outs = pl.pallas_call(
        _note_bwd_kernel(keep_prob, k, B, N, hard),
        grid=(JT, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=([pltpu.VMEM((k * B, H), f32) for _ in range(4)]
                        + [pltpu.VMEM((Ht, H4), f32),
                           pltpu.VMEM((C, H4), f32),
                           pltpu.VMEM((1, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((H, H4), f32),
                           pltpu.VMEM((1, H4), f32),
                           pltpu.VMEM((H, 3), f32),
                           pltpu.VMEM((1, 3), f32)]),
        cost_estimate=pl.CostEstimate(
            flops=6 * N * T * B * (Ht + C + 3 * H) * H4,
            bytes_accessed=2 * ht.size * ht.dtype.itemsize,
            transcendentals=10 * N * T * B * H4,
        ),
    )(seed, ht.astype(cdt), ch.astype(cdt), s0t.astype(cdt),
      s0c.astype(cdt), s1.astype(cdt),
      w0t.astype(cdt), w0c.astype(cdt),
      b0.reshape(1, H4).astype(f32), b1.reshape(1, H4).astype(f32),
      u0.astype(cdt), w1.astype(cdt), u1.astype(cdt),
      wh.astype(cdt), bh.reshape(1, 3).astype(f32),
      hs0, cs0, hs1, cs1, hs0, hs1, dout.astype(f32))

    (dht, dch, ds0t, ds0c, ds1, dw0t, dw0c, db0, du0, dw1, du1, db1,
     dwh, dbh) = outs
    return (dht, dch, ds0t, ds0c, ds1, dw0t, dw0c, db0.reshape(H4),
            db1.reshape(H4), du0, dw1, du1, dwh, dbh.reshape(3))


@functools.lru_cache(maxsize=None)
def _make_note_stack(dtype_name: str, keep_prob: float,
                     hard: bool = False):
    cdt = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def stack(ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1, wh, bh,
              seed):
        # Primal-only (eval) call: skip the backward-residual tapes.
        outs = _note_fwd_impl(ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1,
                              u0, w1, u1, wh, bh, seed, keep_prob, cdt,
                              tapes=False, hard=hard)
        return outs[0]                                     # [N, T, B, 3]

    def fwd_rule(ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1, wh, bh,
                 seed):
        out, hs0, cs0, hs1, cs1 = _note_fwd_impl(
            ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1, wh, bh,
            seed, keep_prob, cdt, hard=hard)
        return out, (ht, ch, s0t, s0c, s1, w0t, w0c, b0, b1, u0, w1, u1,
                     wh, bh, seed, hs0, cs0, hs1, cs1)

    def bwd_rule(residuals, dout):
        import numpy as _np
        (dht, dch, ds0t, ds0c, ds1, dw0t, dw0c, db0, db1, du0, dw1, du1,
         dwh, dbh) = _note_bwd_impl(residuals, dout, keep_prob, cdt,
                                    hard)
        # Match cotangent dtypes to the primals (style streams may be bf16).
        ds0t = ds0t.astype(residuals[2].dtype)
        ds0c = ds0c.astype(residuals[3].dtype)
        ds1 = ds1.astype(residuals[4].dtype)
        dseed = _np.zeros((1, 1), jax.dtypes.float0)
        return (dht, dch, ds0t, ds0c, ds1, dw0t, dw0c, db0, db1, du0, dw1,
                du1, dwh, dbh, dseed)

    stack.defvjp(fwd_rule, bwd_rule)
    return stack


def biax_note_stack(ht, chosen, s0, s1, w0, b0, b1, u0, w1, u1,
                    whead, bhead, dropout_p: float = 0.0, seed: int = 0,
                    compute_dtype=jnp.float32,
                    recurrent_activation: str = "sigmoid"):
    """Note-axis fused stack v3 with fused heads.

    ht:     [T, N, B, Ht] — the time stack's output (raw; its output
            dropout is applied in-kernel on read).
    chosen: [N, T, B, C]  — pre-SHIFTED teacher/sampled conditioning
            (row n holds the chosen note n-1; zeros at n=0).
    s0:     [T, B, Ht+C]  tanh(style proj, layer 0), unmasked/unbroadcast.
    s1:     [T, B, H]     tanh(style proj, layer 1).
    w0:     [Ht+C, 4H] layer-0 input projection (split internally).
    whead:  [H, 3], bhead: [3] — fused sigmoid(play,replay) ++ volume heads.
    Returns [N, T, B, 3] float32 predictions.
    """
    dt = jnp.dtype(compute_dtype)
    T, N, B, Ht = ht.shape
    C = chosen.shape[-1]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    stack = _make_note_stack(dt.name, float(1.0 - dropout_p),
                             recurrent_activation == "hard_sigmoid")
    return stack(ht.astype(dt), chosen.astype(dt),
                 s0[..., :Ht], s0[..., Ht:], s1,
                 w0[:Ht], w0[Ht:], b0.reshape(-1), b1.reshape(-1),
                 u0, w1, u1, whead, bhead.reshape(-1), seed_arr)


def note_stack_dump_masks(ht, chosen, s0, s1, w0, b0, b1, u0, w1, u1,
                          whead, bhead, dropout_p: float, seed: int,
                          compute_dtype=jnp.float32):
    """Test-only sibling of biax_note_stack that also returns the in-kernel
    masks (m_in, m0t, m0c, m1, m_mid, m_out), each [N, T, B, ·]."""
    dt = jnp.dtype(compute_dtype)
    T, N, B, Ht = ht.shape
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    outs = _note_fwd_impl(ht.astype(dt), chosen.astype(dt),
                          s0[..., :Ht], s0[..., Ht:], s1,
                          w0[:Ht], w0[Ht:], b0.reshape(-1), b1.reshape(-1),
                          u0, w1, u1, whead, bhead.reshape(-1), seed_arr,
                          float(1.0 - dropout_p), dt, dump=True)
    out, hs0, cs0, hs1, cs1, m_in, m0t, m0c, m1, mmid, mout = outs
    return out, (m_in, m0t, m0c, m1, mmid, mout)
