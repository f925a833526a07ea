"""Fused note-axis GENERATION kernel (forward-only).

One Pallas invocation samples all 48 pitches of a generation timestep: the
two note-axis LSTM layers, the output heads, temperature adjustment, and the
Bernoulli comparisons run in a single on-chip `fori_loop` — everything (the
time-axis features, both layers' weights, the pre-drawn uniforms) resident in
VMEM.  Replaces ~48 × ~10 tiny XLA ops whose sequencing latency dominated the
sampling step (generation/sampler.py::_note_scan remains the reference path
and the CPU path).

Weight layout trick: the layer-0 input is `concat(feat_n, prev_chosen) +
style_term` (models/deepj.py::note_axis_cell).  Instead of an unaligned
259-wide concat, W0 splits into its feature rows W0f [256, 4H] and chosen
rows W0c [3, 4H], and the style term enters PRE-PROJECTED:
    z0 = feat_n @ W0f + chosen @ W0c + (s0 @ W0) + b0 + h0 @ U0
where `a0 = s0 @ W0 + b0` is computed once per timestep outside (it is
constant across pitches).  Same for layer 1 with `a1 = s1 @ W1 + b1`.

Sampling math matches ops/sampling.py exactly (clip → inverse sigmoid →
divide by T → sigmoid; draw fires when uniform <= p), in float32.

No backward pass: generation never differentiates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(hard: bool = False):
    """hard=True: Keras-2 hard_sigmoid LSTM gates (deviation #12) — the
    heads' sigmoid and the temperature sigmoid below are UNTOUCHED (the
    reference's output heads are plain sigmoid regardless of the LSTM
    recurrent activation)."""
    def _kernel(feats_ref, u_ref, temp_ref,
                w0f_ref, w0c_ref, a0_ref, u0_ref,
                w1_ref, a1_ref, u1_ref,
                wnd_ref, bnd_ref, wvd_ref, bvd_ref,
                out_ref,
                h0_s, c0_s, h1_s, c1_s, chosen_s):
        f32 = jnp.float32
        cdt = feats_ref.dtype
        N = feats_ref.shape[0]          # pitch-major: dynamic indexing must hit
        G = feats_ref.shape[1]          # the leading dimension on TPU
        H = u0_ref.shape[0]

        h0_s[:] = jnp.zeros_like(h0_s)
        c0_s[:] = jnp.zeros_like(c0_s)
        h1_s[:] = jnp.zeros_like(h1_s)
        c1_s[:] = jnp.zeros_like(c1_s)
        chosen_s[:] = jnp.zeros_like(chosen_s)

        temp = temp_ref[:].astype(f32)                      # [G, 1]

        def sigmoid(x):
            # Gate/head math in this kernel is float32 regardless of cdt (the
            # dots cast INPUTS to cdt but accumulate f32), so use the SAME
            # lax.logistic the XLA path's jax.nn.sigmoid lowers to — this is
            # what makes the kernel's probability math track the certified
            # path bit-for-bit (docs/FIDELITY.md; was the tanh identity, which
            # cost 2-11 knife-edge mismatches per 32-piece suite).
            return jax.nn.sigmoid(x)

        def gate(x):
            # Recurrent-gate activation only; f32 math matching the XLA
            # twin exactly (ops/lstm._keras2_hard_sigmoid's 0.2x+0.5 clip).
            if hard:
                return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
            return sigmoid(x)

        def cell(z, h_s, c_s, u_ref):
            z = z + jnp.dot(h_s[:].astype(cdt), u_ref[:],
                            preferred_element_type=f32)
            i = gate(z[:, :H])
            f = gate(z[:, H:2 * H])
            g = jnp.tanh(z[:, 2 * H:3 * H])
            o = gate(z[:, 3 * H:])
            c_new = f * c_s[:] + i * g
            h_new = o * jnp.tanh(c_new)
            h_s[:] = h_new
            c_s[:] = c_new
            return h_new

        def body(n, _):
            feat_n = feats_ref[n]                           # [G, F]
            z0 = (jnp.dot(feat_n, w0f_ref[:], preferred_element_type=f32)
                  + jnp.dot(chosen_s[:].astype(cdt), w0c_ref[:],
                            preferred_element_type=f32)
                  + a0_ref[:].astype(f32))
            h0 = cell(z0, h0_s, c0_s, u0_ref)

            z1 = (jnp.dot(h0.astype(cdt), w1_ref[:], preferred_element_type=f32)
                  + a1_ref[:].astype(f32))
            h1 = cell(z1, h1_s, c1_s, u1_ref)

            # Heads (ref: model.py:94-95,125): sigmoid(play, replay) + linear vol.
            pr = sigmoid(jnp.dot(h1.astype(cdt), wnd_ref[:],
                                 preferred_element_type=f32)
                         + bnd_ref[:].astype(f32))          # [G, 2]
            vol = (jnp.dot(h1.astype(cdt), wvd_ref[:],
                           preferred_element_type=f32)
                   + bvd_ref[:].astype(f32))                # [G, 1]

            # Temperature re-scaling of sigmoid probs — the DIVISION form, like
            # ops/sampling.py::apply_temperature: logit * (1/T) rounds twice
            # and diverges bitwise from the XLA path whenever T != 1 (adaptive
            # temperature bumps T even on default runs).
            p = jnp.clip(pr, 1e-7, 1.0 - 1e-7)
            logit = -jnp.log(1.0 / p - 1.0)
            p = sigmoid(logit / temp)

            u_n = u_ref[n].astype(f32)                      # [G, 2]
            play = (u_n[:, 0:1] <= p[:, 0:1]).astype(f32)
            replay = (u_n[:, 1:2] <= p[:, 1:2]).astype(f32) * play
            volume = jnp.clip(vol, 0.0, 1.0) * play

            chosen = jnp.concatenate([play, replay, volume], axis=-1)  # [G, 3]
            chosen_s[:] = chosen
            out_ref[n] = chosen
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    return _kernel


@functools.lru_cache(maxsize=None)
def _build(dtype_name: str, hard: bool = False):
    cdt = jnp.dtype(dtype_name)
    f32 = jnp.float32

    def run(feats, uniforms, temperature,
            w0f, w0c, a0, u0, w1, a1, u1, wnd, bnd, wvd, bvd):
        # Pitch-major layouts: the kernel's fori_loop indexes the leading dim.
        feats = feats.transpose(1, 0, 2)
        uniforms = uniforms.transpose(1, 0, 2)
        N, G, F = feats.shape
        H = u0.shape[0]
        H4 = 4 * H
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _make_kernel(hard),
            in_specs=[vmem() for _ in range(14)],
            out_specs=vmem(),
            out_shape=jax.ShapeDtypeStruct((N, G, 3), f32),
            scratch_shapes=[
                pltpu.VMEM((G, H), f32), pltpu.VMEM((G, H), f32),
                pltpu.VMEM((G, H), f32), pltpu.VMEM((G, H), f32),
                pltpu.VMEM((G, 3), f32),
            ],
        )(feats.astype(cdt), uniforms.astype(f32),
          temperature.reshape(-1, 1).astype(f32),
          w0f.astype(cdt), w0c.astype(cdt), a0.astype(f32), u0.astype(cdt),
          w1.astype(cdt), a1.astype(f32), u1.astype(cdt),
          wnd.astype(cdt), bnd.reshape(1, -1).astype(f32),
          wvd.astype(cdt), bvd.reshape(1, -1).astype(f32))
        return out.transpose(1, 0, 2)                   # [G, N, 3]

    return jax.jit(run)


def pallas_note_sample(feats, uniforms, temperature, l0, l1,
                       note_dense, volume_dense, style_emb,
                       compute_dtype=jnp.float32,
                       recurrent_activation: str = "sigmoid"):
    """Sample one generation timestep's 48 pitches in one fused kernel.

    feats: [G, N, time_units] time-axis features for this step.
    uniforms: [G, N, 2] pre-drawn uniforms (play, replay).
    temperature: [G].
    l0/l1: note-axis AxisLayer params; note_dense/volume_dense: head Dense.
    style_emb: [G, style_units] — projected per layer and folded into the
    per-timestep additive constants here.

    Returns [G, N, 3] sampled (play, replay, volume), float32.
    """
    F = feats.shape[-1]
    # Split W0 into feature/chosen rows; fold the (tanh) style projections
    # into per-timestep constants a0/a1 (constant across pitches).
    w0 = l0.lstm.kernel
    w0f, w0c = w0[:F], w0[F:]
    s0 = jnp.tanh(style_emb @ l0.style_proj.kernel + l0.style_proj.bias)
    a0 = s0 @ w0 + l0.lstm.bias
    s1 = jnp.tanh(style_emb @ l1.style_proj.kernel + l1.style_proj.bias)
    a1 = s1 @ l1.lstm.kernel + l1.lstm.bias

    run = _build(jnp.dtype(compute_dtype).name,
                 recurrent_activation == "hard_sigmoid")
    return run(feats, uniforms, temperature,
               w0f, w0c, a0, l0.lstm.recurrent,
               l1.lstm.kernel, a1, l1.lstm.recurrent,
               note_dense.kernel, note_dense.bias,
               volume_dense.kernel, volume_dense.bias)
