"""The DeepJ biaxial model, TPU-first.

Architecture parity with the reference (ref: model.py:51-169): note-invariant
features (pitch position, pitch class, chromagram, octave convolution, beat),
two style-conditioned LSTM layers scanning over TIME (weights shared across
the 48 notes), two style-conditioned LSTM layers scanning over PITCH (weights
shared across timesteps), sigmoid (play, replay) + linear volume heads, and
the masked three-term loss (ref: model.py:14-20).

TPU-first decisions (not translations):
  * One params pytree serves training and generation — the weight sharing the
    reference engineered with Keras layer caches (ref: model.py:92-93,110-122)
    is free in functional JAX.
  * The time scan folds (batch × notes) into one effective batch of B·48
    sequences; the note scan folds (batch × time) into B·T sequences — large
    MXU-shaped matmuls instead of TimeDistributed loops.
  * The per-sequence input projections run as single [T·B, D]×[D, 4H] matmuls
    outside the recurrence (ops/lstm.py); the recurrence itself can run as a
    fused Pallas kernel (ops/pallas_lstm.py).
  * Deliberate fix vs. the reference: its chromagram feature builder reshapes
    [48, B, T] → [B, T, 48, 1] rawly, scrambling batch/time/pitch
    (ref: model.py:43-49 — tf.reshape does not transpose).  We implement the
    documented intent: per-pitch-class played-note counts, tiled per octave.

Dropout sites and rates match the reference exactly: input dropout 0.2 on
notes/beat/chosen (ref: model.py:136-138), 0.5 after the octave conv, after
each broadcast style projection, and after each LSTM (ref: model.py:58,80-85,
116-123); all disabled at inference, like Keras `predict`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from music_generator_tpu.config import Config
from music_generator_tpu.ops.lstm import LSTMParams, lstm_init, lstm_scan, lstm_step


# ---------------------------------------------------------------------------
# Small building blocks
# ---------------------------------------------------------------------------

class Dense(NamedTuple):
    kernel: jax.Array
    bias: jax.Array


def dense_init(key, in_dim, out_dim, dtype=jnp.float32) -> Dense:
    kernel = jax.nn.initializers.glorot_uniform()(key, (in_dim, out_dim), dtype)
    return Dense(kernel, jnp.zeros((out_dim,), dtype))


def dense_apply(p: Dense, x: jax.Array, dt) -> jax.Array:
    return (x.astype(dt) @ p.kernel.astype(dt) + p.bias.astype(dt))


class Conv1D(NamedTuple):
    kernel: jax.Array   # [width, in_ch, out_ch]
    bias: jax.Array


def conv1d_init(key, width, in_ch, out_ch, dtype=jnp.float32) -> Conv1D:
    kernel = jax.nn.initializers.glorot_uniform()(
        key, (width, in_ch, out_ch), dtype)
    return Conv1D(kernel, jnp.zeros((out_ch,), dtype))


def conv1d_same(p: Conv1D, x: jax.Array, dt) -> jax.Array:
    """'same' 1-D conv over the second-to-last axis of [B, L, C], with
    Keras's asymmetric padding for even widths (left (w-1)//2, right w//2)."""
    w = p.kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x.astype(dt), p.kernel.astype(dt),
        window_strides=(1,),
        padding=[((w - 1) // 2, w // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + p.bias.astype(dt)


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

class AxisLayer(NamedTuple):
    style_proj: Dense
    lstm: NamedTuple   # LSTMParams, or GLRUParams when
                       # cfg.time_axis_kind == "linear" (the parallel-scan
                       # study variant, ops/linear_scan.py)


class Params(NamedTuple):
    style_embed: Dense            # num_styles → style_units ('style' layer,
                                  # ref: model.py:141-142)
    conv: Conv1D                  # octave context conv (ref: model.py:56)
    time_axis: Tuple[AxisLayer, ...]
    note_axis: Tuple[AxisLayer, ...]
    note_dense: Dense             # → (play, replay) sigmoid (ref: model.py:94)
    volume_dense: Dense           # → volume linear (ref: model.py:95)


def feature_dim(cfg: Config) -> int:
    """pitch_pos(1) + pitch_class(12) + chroma(1) + conv + beat."""
    return 1 + cfg.octave + 1 + cfg.octave_units + cfg.notes_per_bar


def init_params(key: jax.Array, cfg: Config) -> Params:
    # 2 keys per axis layer + 4 for embedding/conv/heads.  split() is
    # prefix-stable in key count, so max(16, ...) keeps every value
    # byte-identical to the historical 16-key split for the default 2+2
    # config (committed checkpoints / pinned artifacts) while deeper
    # stacks (the config allows up to 8 per axis) no longer exhaust the
    # iterator.
    n_keys = 2 * (cfg.time_axis_layers + cfg.note_axis_layers) + 4
    keys = iter(jax.random.split(key, max(16, n_keys)))
    f = feature_dim(cfg)

    time_layers = []
    d = f
    for _ in range(cfg.time_axis_layers):
        # Key order matters: style_proj draws BEFORE the recurrent init,
        # preserving the seeded initialization the pre-linear-variant
        # code produced for the default "lstm" path (same seed -> same
        # weights across versions; review r4 finding).
        style_key, rec_key = next(keys), next(keys)
        if cfg.time_axis_kind == "linear":
            from music_generator_tpu.ops.linear_scan import glru_init
            rec = glru_init(rec_key, d, cfg.time_axis_units)
        else:
            rec = lstm_init(rec_key, d, cfg.time_axis_units)
        time_layers.append(AxisLayer(
            style_proj=dense_init(style_key, cfg.style_units, d),
            lstm=rec))
        d = cfg.time_axis_units

    note_layers = []
    d = cfg.time_axis_units + cfg.note_units
    for _ in range(cfg.note_axis_layers):
        note_layers.append(AxisLayer(
            style_proj=dense_init(next(keys), cfg.style_units, d),
            lstm=lstm_init(next(keys), d, cfg.note_axis_units)))
        d = cfg.note_axis_units

    return Params(
        style_embed=dense_init(next(keys), cfg.num_styles, cfg.style_units),
        conv=conv1d_init(next(keys), 2 * cfg.octave, cfg.note_units,
                         cfg.octave_units),
        time_axis=tuple(time_layers),
        note_axis=tuple(note_layers),
        note_dense=dense_init(next(keys), cfg.note_axis_units, 2),
        volume_dense=dense_init(next(keys), cfg.note_axis_units, 1),
    )


# ---------------------------------------------------------------------------
# The model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DeepJ:
    """Stateless model namespace bound to a config."""

    cfg: Config

    def __post_init__(self):
        # Validate the gate flavor at the single construction chokepoint:
        # the fused kernel stacks translate it via `== "hard_sigmoid"`, so
        # an unknown value (e.g. the typo "hard-sigmoid") would otherwise
        # SILENTLY run sigmoid gates on the fused path — the exact
        # substitution the pre-r5 xla-only routing failed loudly on
        # (review r5 finding; ops/lstm.py raises for its own path only).
        from music_generator_tpu.ops.lstm import _RECURRENT_ACTIVATIONS
        if self.cfg.lstm_recurrent_activation not in _RECURRENT_ACTIVATIONS:
            raise ValueError(
                f"unknown lstm_recurrent_activation="
                f"{self.cfg.lstm_recurrent_activation!r}; expected one of "
                f"{sorted(_RECURRENT_ACTIVATIONS)}")

    # -- helpers ----------------------------------------------------------

    def _dt(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def _kernel(self) -> str:
        cfg = self.cfg
        # r5: the fused Pallas kernels implement BOTH gate flavors
        # (sigmoid and Keras 2's hard_sigmoid, deviation #12), so
        # reference-trained weights keep the fused training speedup and
        # the fused generation path (VERDICT r4 #6; parity pinned by
        # tests/test_hard_gates.py).
        k = cfg.lstm_kernel
        if k != "auto":
            return k
        return "pallas" if jax.default_backend() == "tpu" else "xla"

    # -- feature builders (ref: model.py:22-49) ---------------------------

    def note_features(self, notes: jax.Array, beat: jax.Array,
                      conv_out: jax.Array) -> jax.Array:
        """Concat per-(time, note) features → [B, T, N, F].

        notes: [B, T, N, 3], beat: [B, T, notes_per_bar],
        conv_out: [B, T, N, octave_units].
        """
        cfg = self.cfg
        B, T, N, _ = notes.shape
        dt = conv_out.dtype

        # Normalized pitch position (ref: model.py:22-30).
        pitch_pos = jnp.broadcast_to(
            (jnp.arange(N, dtype=dt) / N)[None, None, :, None], (B, T, N, 1))

        # Pitch-class one-hot (ref: model.py:32-41).
        classes = jax.nn.one_hot(jnp.arange(N) % cfg.octave, cfg.octave,
                                 dtype=dt)
        pitch_class = jnp.broadcast_to(classes[None, None], (B, T, N, cfg.octave))

        # Chromagram: per pitch class, total play mass across octaves, seen
        # by every note of that class (intent of ref: model.py:43-49; see
        # module docstring for the reshape bug we fix).
        play = notes[..., 0]                              # [B, T, N]
        bins = play.reshape(B, T, cfg.num_octaves, cfg.octave).sum(axis=2)
        chroma = jnp.tile(bins, (1, 1, cfg.num_octaves))[..., None].astype(dt)

        # Beat one-hot repeated for every note (ref: model.py:66).
        beat_rep = jnp.broadcast_to(beat[:, :, None, :].astype(dt),
                                    (B, T, N, beat.shape[-1]))

        return jnp.concatenate(
            [pitch_pos, pitch_class, chroma, conv_out, beat_rep], axis=-1)

    def octave_conv(self, params: Params, notes: jax.Array,
                    rng, train: bool) -> jax.Array:
        """tanh(Conv1D over the note axis) + dropout (ref: model.py:56-58)."""
        B, T, N, C = notes.shape
        x = notes.reshape(B * T, N, C)
        out = jnp.tanh(conv1d_same(params.conv, x, self._dt()))
        out = out.reshape(B, T, N, -1)
        return dropout(_sub(rng, "conv"), out, self.cfg.dropout, train)

    # -- style ------------------------------------------------------------

    def style_embedding(self, params: Params, style: jax.Array) -> jax.Array:
        """The shared 'style' Dense layer (ref: model.py:141-142)."""
        return dense_apply(params.style_embed, style, self._dt())

    def _style_add(self, layer: AxisLayer, x: jax.Array, style_emb: jax.Array,
                   rng, train: bool, site: str) -> jax.Array:
        """Per-layer style integration: Dense → broadcast per note → tanh →
        dropout → add (ref: model.py:77-82, 110-117).  x: [B, T, N, F],
        style_emb: [B, T, style_units] (or [B, F']-free shapes broadcastable
        to x after note-axis expansion)."""
        proj = dense_apply(layer.style_proj, style_emb, self._dt())
        proj = jnp.tanh(proj)[..., None, :]            # broadcast over notes
        proj = jnp.broadcast_to(proj, x.shape)
        proj = dropout(_sub(rng, site), proj, self.cfg.dropout, train)
        return x + proj

    # -- time axis (ref: model.py:51-89) ----------------------------------

    def time_axis(self, params: Params, notes: jax.Array, beat: jax.Array,
                  style_emb: jax.Array, rng=None, train: bool = False) -> jax.Array:
        """[B, T, N, 3] → [B, T, N, time_axis_units]."""
        cfg = self.cfg
        B, T, N, _ = notes.shape

        conv_out = self.octave_conv(params, notes, rng, train)
        x = self.note_features(notes, beat, conv_out)
        x_tm = self.time_axis_tm(params, x.transpose(1, 0, 2, 3),
                                 style_emb.transpose(1, 0, 2), rng, train)
        return x_tm.transpose(1, 0, 2, 3)

    def _use_fused(self, layers) -> bool:
        """The fused two-layer stack applies when running the Pallas kernels
        with exactly two equal-width LSTM layers (the DeepJ shape; the
        linear-scan study variant has no recurrent matrix to fuse)."""
        return (self.cfg.fused_axis_kernel
                and self._kernel() == "pallas"
                and len(layers) == 2
                and isinstance(layers[0].lstm, LSTMParams)
                and layers[0].lstm.recurrent.shape
                == layers[1].lstm.recurrent.shape)

    def _fused_stack(self, layers, x_flat: jax.Array, proj1_flat: jax.Array,
                     rng, train: bool, site: str) -> jax.Array:
        """Run two layers as one fused Pallas kernel.

        x_flat: [S, B_eff, F] — layer-0 input (style-0 term already added),
        proj1_flat: [S, B_eff, H] — the masked layer-1 style term.
        Returns hs1 [S, B_eff, H].
        """
        from music_generator_tpu.ops.pallas_lstm2 import pallas_lstm2
        cfg = self.cfg
        l0, l1 = layers
        dt = self._dt()
        # train=True with no rng means NO dropout (matching dropout() and
        # the v3 path) — a frozen seed-0 mask would silently zero the same
        # activations every step.
        p = cfg.dropout if (train and rng is not None) else 0.0
        if p > 0.0:
            seed = jax.random.randint(_sub(rng, site), (), 0, 2**31 - 1)
        else:
            seed = 0
        hs1, _ = pallas_lstm2(x_flat, proj1_flat,
                              l0.lstm.kernel, l0.lstm.bias, l1.lstm.bias,
                              l0.lstm.recurrent, l1.lstm.kernel,
                              l1.lstm.recurrent, dropout_p=p, seed=seed,
                              compute_dtype=dt,
                              recurrent_activation=(
                                  cfg.lstm_recurrent_activation))
        return hs1

    def time_axis_tm(self, params: Params, x: jax.Array, style_emb_tm: jax.Array,
                     rng=None, train: bool = False) -> jax.Array:
        """Time-major core: x [T, B, N, F], style_emb_tm [T, B, style_units]
        → [T, B, N, time_units].

        Stays in the scan-major layout across both layers — one transpose in,
        one out, instead of a 400MB relayout per layer (the HBM-bandwidth
        lesson from profiling the v1 step)."""
        cfg = self.cfg
        T, B, N, _ = x.shape

        if self._use_fused(params.time_axis):
            l0, l1 = params.time_axis
            proj0 = jnp.tanh(dense_apply(l0.style_proj, style_emb_tm,
                                         self._dt()))
            proj0 = jnp.broadcast_to(proj0[:, :, None, :], x.shape)
            proj0 = dropout(_sub(rng, "tstyle0"), proj0, cfg.dropout, train)
            x = x + proj0
            proj1 = jnp.tanh(dense_apply(l1.style_proj, style_emb_tm,
                                         self._dt()))
            H = proj1.shape[-1]
            proj1 = jnp.broadcast_to(proj1[:, :, None, :], (T, B, N, H))
            proj1 = dropout(_sub(rng, "tstyle1"), proj1, cfg.dropout, train)
            hs1 = self._fused_stack(params.time_axis,
                                    x.reshape(T, B * N, x.shape[-1]),
                                    proj1.reshape(T, B * N, H),
                                    rng, train, "tfuse")
            return dropout(_sub(rng, "tdrop1"), hs1.reshape(T, B, N, -1),
                           cfg.dropout, train)

        for l, layer in enumerate(params.time_axis):
            proj = jnp.tanh(dense_apply(layer.style_proj, style_emb_tm,
                                        self._dt()))          # [T, B, F]
            proj = jnp.broadcast_to(proj[:, :, None, :], x.shape)
            proj = dropout(_sub(rng, f"tstyle{l}"), proj, cfg.dropout, train)
            x = x + proj
            if isinstance(layer.lstm, LSTMParams):
                hs, _ = lstm_scan(layer.lstm,
                                  x.reshape(T, B * N, x.shape[-1]),
                                  compute_dtype=self._dt(),
                                  kernel=self._kernel(),
                                  recurrent_activation=(
                                      cfg.lstm_recurrent_activation))
            else:
                # The linear-scan study variant: O(log T) associative scan,
                # no recurrent matmul (ops/linear_scan.py).
                from music_generator_tpu.ops.linear_scan import glru_scan
                hs = glru_scan(layer.lstm, x.reshape(T, B * N, x.shape[-1]),
                               compute_dtype=self._dt())
            x = dropout(_sub(rng, f"tdrop{l}"), hs.reshape(T, B, N, -1),
                        cfg.dropout, train)
        return x

    # -- note axis (ref: model.py:91-126) ---------------------------------

    def note_axis(self, params: Params, time_out: jax.Array, chosen: jax.Array,
                  style_emb: jax.Array, rng=None, train: bool = False) -> jax.Array:
        """[B, T, N, time_units] + teacher-forced targets → [B, T, N, 3]."""
        out_nm = self.note_axis_nm(params, time_out.transpose(2, 0, 1, 3),
                                   chosen, style_emb, rng, train)
        return out_nm.transpose(1, 2, 0, 3)

    def note_axis_nm(self, params: Params, time_out_nm: jax.Array,
                     chosen: jax.Array, style_emb: jax.Array,
                     rng=None, train: bool = False) -> jax.Array:
        """Note-major core: time_out_nm [N, B, T, time_units],
        chosen [B, T, N, 3] (batch-major; small) → [N, B, T, 3]."""
        cfg = self.cfg
        N, B, T, _ = time_out_nm.shape

        # Shift targets one NOTE down so note n conditions on notes < n
        # (ref: model.py:100-104); note-major: prepend a zero note row.
        chosen_nm = chosen.transpose(2, 0, 1, 3)
        shift_chosen = jnp.concatenate(
            [jnp.zeros_like(chosen_nm[:1]), chosen_nm[:-1]], axis=0)
        x = jnp.concatenate(
            [time_out_nm, shift_chosen.astype(time_out_nm.dtype)], axis=-1)

        if self._use_fused(params.note_axis):
            l0, l1 = params.note_axis
            proj0 = jnp.tanh(dense_apply(l0.style_proj, style_emb, self._dt()))
            proj0 = jnp.broadcast_to(proj0[None], x.shape)
            proj0 = dropout(_sub(rng, "nstyle0"), proj0, cfg.dropout, train)
            x = x + proj0
            proj1 = jnp.tanh(dense_apply(l1.style_proj, style_emb, self._dt()))
            H = proj1.shape[-1]
            proj1 = jnp.broadcast_to(proj1[None], (N, B, T, H))
            proj1 = dropout(_sub(rng, "nstyle1"), proj1, cfg.dropout, train)
            hs1 = self._fused_stack(params.note_axis,
                                    x.reshape(N, B * T, x.shape[-1]),
                                    proj1.reshape(N, B * T, H),
                                    rng, train, "nfuse")
            x = dropout(_sub(rng, "ndrop1"), hs1.reshape(N, B, T, -1),
                        cfg.dropout, train)
            return self.heads(params, x)

        for l, layer in enumerate(params.note_axis):
            proj = jnp.tanh(dense_apply(layer.style_proj, style_emb,
                                        self._dt()))          # [B, T, F]
            proj = jnp.broadcast_to(proj[None], x.shape)
            proj = dropout(_sub(rng, f"nstyle{l}"), proj, cfg.dropout, train)
            x = x + proj
            hs, _ = lstm_scan(layer.lstm, x.reshape(N, B * T, x.shape[-1]),
                              compute_dtype=self._dt(),
                              kernel=self._kernel(),
                              recurrent_activation=(
                                  cfg.lstm_recurrent_activation))
            x = dropout(_sub(rng, f"ndrop{l}"), hs.reshape(N, B, T, -1),
                        cfg.dropout, train)

        return self.heads(params, x)

    def heads(self, params: Params, x: jax.Array) -> jax.Array:
        """sigmoid(play, replay) ++ linear volume (ref: model.py:94-95,125)."""
        dt = self._dt()
        notes_out = jax.nn.sigmoid(dense_apply(params.note_dense, x, dt))
        volume_out = dense_apply(params.volume_dense, x, dt)
        return jnp.concatenate([notes_out, volume_out], axis=-1).astype(
            jnp.float32)

    # -- full forward (training graph, ref: model.py:128-152) -------------

    def _use_biax_v3(self, params: Params) -> bool:
        """The v3 fully-fused kernels apply to the DeepJ shape: two equal-
        width layers per axis, Pallas backend."""
        cfg = self.cfg
        return (cfg.fused_biax_v3 and self._kernel() == "pallas"
                and len(params.time_axis) == 2
                and len(params.note_axis) == 2
                and isinstance(params.time_axis[0].lstm, LSTMParams)
                and params.time_axis[0].lstm.recurrent.shape
                == params.time_axis[1].lstm.recurrent.shape
                and params.note_axis[0].lstm.recurrent.shape
                == params.note_axis[1].lstm.recurrent.shape)

    def forward(self, params: Params, notes: jax.Array, chosen: jax.Array,
                beat: jax.Array, style: jax.Array, rng=None,
                train: bool = False) -> jax.Array:
        cfg = self.cfg
        if self._use_biax_v3(params):
            return self._forward_biax_v3(params, notes, chosen, beat, style,
                                         rng, train)
        notes = dropout(_sub(rng, "in_notes"), notes, cfg.input_dropout, train)
        beat = dropout(_sub(rng, "in_beat"), beat, cfg.input_dropout, train)
        chosen = dropout(_sub(rng, "in_chosen"), chosen, cfg.input_dropout, train)

        style_emb = self.style_embedding(params, style)
        # Fused layout path: features → time-major scans → one relayout to
        # note-major → pitch scans → heads; the [B,T,N,·] order only exists
        # at the (tiny) input and output tensors.
        conv_out = self.octave_conv(params, notes, rng, train)
        feats = self.note_features(notes, beat, conv_out)
        t_out_tm = self.time_axis_tm(params, feats.transpose(1, 0, 2, 3),
                                     style_emb.transpose(1, 0, 2), rng, train)
        out_nm = self.note_axis_nm(params, t_out_tm.transpose(2, 1, 0, 3),
                                   chosen, style_emb, rng, train)
        return out_nm.transpose(1, 2, 0, 3)

    def _forward_biax_v3(self, params: Params, notes: jax.Array,
                         chosen: jax.Array, beat: jax.Array, style: jax.Array,
                         rng=None, train: bool = False) -> jax.Array:
        """The v3 fully-fused forward: both axes run as single Pallas stacks
        in the canonical [scan, across, B, feat] layout — every dropout
        site, both style adds, the inter-stack relayout, the shift-chosen
        concat, and the heads live on-chip (ops/pallas_biax.py)."""
        from music_generator_tpu.ops.pallas_biax import (
            biax_note_stack,
            biax_time_stack,
        )
        cfg = self.cfg
        dt = self._dt()
        notes = dropout(_sub(rng, "in_notes"), notes, cfg.input_dropout, train)
        beat = dropout(_sub(rng, "in_beat"), beat, cfg.input_dropout, train)
        chosen = dropout(_sub(rng, "in_chosen"), chosen, cfg.input_dropout,
                         train)

        style_emb = self.style_embedding(params, style)        # [B, T, S]
        conv_out = self.octave_conv(params, notes, rng, train)
        feats = self.note_features(notes, beat, conv_out)      # [B, T, N, F]

        # Like the unfused path's dropout(key=None) no-op: train=True with
        # no rng means NO dropout — not a frozen seed-0 mask.
        p = cfg.dropout if (train and rng is not None) else 0.0
        if p > 0.0:
            seed_t = jax.random.randint(_sub(rng, "tfuse"), (), 0, 2**31 - 1)
            seed_n = jax.random.randint(_sub(rng, "nfuse"), (), 0, 2**31 - 1)
        else:
            seed_t = seed_n = 0

        emb_tb = style_emb.transpose(1, 0, 2)                  # [T, B, S]
        tl0, tl1 = params.time_axis
        s0_t = jnp.tanh(dense_apply(tl0.style_proj, emb_tb, dt))
        s1_t = jnp.tanh(dense_apply(tl1.style_proj, emb_tb, dt))
        ht = biax_time_stack(
            feats.transpose(1, 2, 0, 3),                       # [T, N, B, F]
            s0_t, s1_t,
            tl0.lstm.kernel, tl0.lstm.bias, tl1.lstm.bias,
            tl0.lstm.recurrent, tl1.lstm.kernel, tl1.lstm.recurrent,
            dropout_p=p, seed=seed_t, compute_dtype=dt,
            recurrent_activation=cfg.lstm_recurrent_activation)

        nl0, nl1 = params.note_axis
        chosen_ntb = chosen.transpose(2, 1, 0, 3)              # [N, T, B, 3]
        shift_chosen = jnp.concatenate(
            [jnp.zeros_like(chosen_ntb[:1]), chosen_ntb[:-1]], axis=0)
        s0_n = jnp.tanh(dense_apply(nl0.style_proj, emb_tb, dt))
        s1_n = jnp.tanh(dense_apply(nl1.style_proj, emb_tb, dt))
        whead = jnp.concatenate(
            [params.note_dense.kernel, params.volume_dense.kernel], axis=-1)
        bhead = jnp.concatenate(
            [params.note_dense.bias, params.volume_dense.bias])
        out = biax_note_stack(
            ht, shift_chosen, s0_n, s1_n,
            nl0.lstm.kernel, nl0.lstm.bias, nl1.lstm.bias,
            nl0.lstm.recurrent, nl1.lstm.kernel, nl1.lstm.recurrent,
            whead, bhead, dropout_p=p, seed=seed_n, compute_dtype=dt,
            recurrent_activation=cfg.lstm_recurrent_activation)
        return out.transpose(2, 1, 0, 3)                       # [B, T, N, 3]

    # -- loss (ref: model.py:14-20) ---------------------------------------

    def loss(self, params: Params, batch, rng=None,
             train: bool = True) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        notes, targets, beats, styles = batch
        preds = self.forward(params, notes, targets, beats, styles, rng, train)
        return primary_loss(targets, preds)

    # -- streaming single-step paths (generation) --------------------------

    def init_time_state(self, batch: int) -> Tuple:
        """Per-layer (h, c) for the time-axis LSTMs — or (h,) for the
        linear-scan variant; effective batch is (generations × notes)."""
        cfg = self.cfg
        if cfg.time_axis_kind == "linear":
            return tuple(
                (jnp.zeros((batch * cfg.num_notes, cfg.time_axis_units),
                           jnp.float32),)
                for _ in range(cfg.time_axis_layers))
        return tuple(
            (jnp.zeros((batch * cfg.num_notes, cfg.time_axis_units), jnp.float32),
             jnp.zeros((batch * cfg.num_notes, cfg.time_axis_units), jnp.float32))
            for _ in range(cfg.time_axis_layers))

    def time_axis_step(self, params: Params, note_row: jax.Array,
                       beat_row: jax.Array, style_emb: jax.Array,
                       state: Tuple) -> Tuple[jax.Array, Tuple]:
        """One streaming timestep of the time axis.

        note_row: [G, N, 3] (the notes chosen at the previous step),
        beat_row: [G, notes_per_bar], style_emb: [G, style_units].
        Returns ([G, N, time_units], new_state).  This carries O(1) recurrent
        state instead of recomputing a 128-step window every step
        (ref: generate.py:106-109 — the host-loop architecture this replaces).
        """
        cfg = self.cfg
        G, N, _ = note_row.shape
        notes = note_row[:, None]                     # [G, 1, N, 3]
        beat = beat_row[:, None]                      # [G, 1, npb]

        conv_out = self.octave_conv(params, notes, None, False)
        x = self.note_features(notes, beat, conv_out)[:, 0]   # [G, N, F]

        new_state = []
        for layer, layer_state in zip(params.time_axis, state):
            proj = jnp.tanh(dense_apply(layer.style_proj, style_emb, self._dt()))
            x = x + proj[:, None, :]
            xin = x.reshape(G * N, x.shape[-1])
            if isinstance(layer.lstm, LSTMParams):
                h, c = lstm_step(layer.lstm, xin, *layer_state,
                                 compute_dtype=self._dt(),
                                 recurrent_activation=(
                                     cfg.lstm_recurrent_activation))
                new_state.append((h, c))
            else:
                from music_generator_tpu.ops.linear_scan import glru_step
                h = glru_step(layer.lstm, xin, layer_state[0],
                              compute_dtype=self._dt())
                new_state.append((h,))
            x = h.reshape(G, N, -1)
        return x, tuple(new_state)

    def init_note_state(self, batch: int) -> Tuple:
        cfg = self.cfg
        return tuple(
            (jnp.zeros((batch, cfg.note_axis_units), jnp.float32),
             jnp.zeros((batch, cfg.note_axis_units), jnp.float32))
            for _ in range(cfg.note_axis_layers))

    def note_axis_cell(self, params: Params, feat_n: jax.Array,
                       prev_chosen: jax.Array, style_emb: jax.Array,
                       state: Tuple) -> Tuple[jax.Array, Tuple]:
        """One note of the pitch recurrence during generation.

        feat_n: [G, time_units] (time-axis features of note n),
        prev_chosen: [G, 3] (the sampled note n−1; zeros for n=0).
        Returns ([G, 3] prediction for note n, new state).
        """
        x = jnp.concatenate([feat_n, prev_chosen.astype(feat_n.dtype)], axis=-1)
        new_state = []
        for layer, (h, c) in zip(params.note_axis, state):
            proj = jnp.tanh(dense_apply(layer.style_proj, style_emb, self._dt()))
            x = x + proj
            h, c = lstm_step(layer.lstm, x, h, c, compute_dtype=self._dt(),
                             recurrent_activation=(
                                 self.cfg.lstm_recurrent_activation))
            new_state.append((h, c))
            x = h
        return self.heads(params, x), tuple(new_state)


def primary_loss(y_true: jax.Array,
                 y_pred: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """BCE(play) + masked BCE(replay) + masked MSE(volume)
    (ref: model.py:14-20).

    The mask replaces the prediction with the target wherever the play target
    is 0 — zeroing the gradient exactly, not just downweighting — matching
    `played*pred + (1-played)*true` (ref: model.py:18-19).  BCE clips
    probabilities at 1e-7 like keras.backend.binary_crossentropy.
    """
    bce_note, bce_replay, mse = _loss_terms(y_true, y_pred)
    total = jnp.mean(bce_note + bce_replay + mse)
    metrics = {
        "loss": total,
        "bce_play": jnp.mean(bce_note),
        "bce_replay": jnp.mean(bce_replay),
        "mse_volume": jnp.mean(mse),
    }
    return total, metrics


def _loss_terms(y_true: jax.Array, y_pred: jax.Array):
    """Elementwise [..., T, N] loss terms shared by the scalar training loss
    and the per-sample evaluation metrics."""
    played = y_true[..., 0]

    def bce(t, p):
        p = jnp.clip(p, 1e-7, 1 - 1e-7)
        return -(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))

    bce_note = bce(y_true[..., 0], y_pred[..., 0])
    replay_masked = played * y_pred[..., 1] + (1 - played) * y_true[..., 1]
    bce_replay = bce(y_true[..., 1], replay_masked)
    vol_masked = played * y_pred[..., 2] + (1 - played) * y_true[..., 2]
    mse = jnp.square(y_true[..., 2] - vol_masked)
    return bce_note, bce_replay, mse


def per_sample_loss(y_true: jax.Array,
                    y_pred: jax.Array) -> Dict[str, jax.Array]:
    """primary_loss's metrics reduced per batch row ([B] vectors instead of
    scalars), so evaluation can weight out wrap-padded duplicate rows —
    the scalar loss equals the plain mean of the per-sample values."""
    bce_note, bce_replay, mse = _loss_terms(y_true, y_pred)
    axes = tuple(range(1, bce_note.ndim))
    return {
        "loss": jnp.mean(bce_note + bce_replay + mse, axis=axes),
        "bce_play": jnp.mean(bce_note, axis=axes),
        "bce_replay": jnp.mean(bce_replay, axis=axes),
        "mse_volume": jnp.mean(mse, axis=axes),
    }


def _sub(rng: Optional[jax.Array], name: str) -> Optional[jax.Array]:
    """Deterministic per-site RNG stream."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, _site_id(name))


# Static site→ID table: the dropout stream at each site is a stable function
# of (seed, site name) — NOT of first-call order, so fused and unfused paths
# (and fresh processes) derive identical per-site keys.  Layer-indexed names
# are pre-registered up to 8 layers per axis (the config allows deeper
# stacks than DeepJ's 2+2).
_SITE_IDS: Dict[str, int] = {
    name: i + 1
    for i, name in enumerate(
        ["in_notes", "in_beat", "in_chosen", "conv", "tfuse", "nfuse"]
        + [f"{axis}{kind}{layer}" for axis in ("t", "n")
           for kind in ("style", "drop") for layer in range(8)])
}


def _site_id(name: str) -> int:
    sid = _SITE_IDS.get(name)
    if sid is not None:
        return sid
    # Configs deeper than the pre-registered 8 layers/axis fall back to a
    # stable content hash — still a pure function of the site name (never
    # of call order), offset clear of the static table.
    import zlib
    return 1000 + (zlib.crc32(name.encode()) % 1_000_000)
