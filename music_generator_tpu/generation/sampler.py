"""On-device autoregressive generation.

The reference generates with a host loop: per timestep one `time_model`
batched predict recomputing a full 128-step window, then 48 per-note
`note_model` predicts, then host numpy sampling — 25,088 host→device round
trips for 32 bars (SURVEY.md §3.2).  Here the ENTIRE generation is one XLA
program: `lax.scan` over timesteps carrying the time-axis LSTM states (O(1)
per step, unbounded length — no window recompute), an inner `lax.scan` over
the 48 pitches interleaving the note-axis LSTM with Bernoulli sampling, and
the adaptive-temperature state machine (ref: generate.py:60-71) as part of
the carry.  The batch dimension is a vector of style mixtures (BASELINE
configs 4-5).

Sampling semantics match ref: generate.py:47-58: temperature-adjusted play
and replay probabilities, volume copied through only when played, replay
sampled only when played.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from music_generator_tpu.config import Config
from music_generator_tpu.data.dataset import unclamp_midi
from music_generator_tpu.midi.codec import midi_encode
from music_generator_tpu.midi.io import write_midifile
from music_generator_tpu.models.deepj import DeepJ, Params
from music_generator_tpu.ops.sampling import apply_temperature


@functools.lru_cache(maxsize=None)
def _velocity_grid(max_velocity: int) -> np.ndarray:
    """Exact f32(k/max_velocity) grid for gen_volume_quantize (IEEE true
    division on the host; see the quantization comment in _note_scan).
    Sized from cfg.max_velocity so a non-default velocity ceiling snaps to
    the encoder's actual grid (advisor r3 finding)."""
    return (np.arange(max_velocity + 1, dtype=np.float32)
            / np.float32(max_velocity))


class StepState(NamedTuple):
    time_state: Tuple            # per-layer (h, c) of the time axis
    prev_note: jax.Array         # [G, N, 3] — the notes chosen last step
    temperature: jax.Array       # [G] current (adaptive) temperature
    base_temp: jax.Array         # [G] reset value — traced, so one compiled
                                 # executable serves every temperature
    silent_time: jax.Array       # [G] int32
    stream_keys: jax.Array       # [G] per-stream PRNG keys, constant through
                                 # the scan: fold_in(key(seed), global index)


@dataclasses.dataclass
class GenerationResult:
    notes: np.ndarray            # [G, T, N, 3]
    styles: np.ndarray           # [G, num_styles]


class Sampler:
    """Compiles once per (num_generations, num_steps) and streams MIDI.

    With a mesh, the generation batch (the style-mixture axis) shards over
    the `data` axis — BASELINE config 4's 64 parallel samples ride a
    v5e-8 as 8 per chip with zero cross-chip traffic (the recurrences are
    independent per generation; XLA partitions the whole scan)."""

    def __init__(self, model: DeepJ, params: Params, default_temp: float = 1.0,
                 mesh=None):
        # Generation runs backend-stable (cfg.gen_dtype, usually float32 —
        # vs bf16 training compute) so fixed-seed output is byte-identical
        # between the TPU chip and a CPU run (BASELINE.md fidelity target;
        # docs/FIDELITY.md records the verification).
        cfg = model.cfg
        if cfg.compute_dtype != cfg.gen_dtype:
            model = DeepJ(cfg.replace(compute_dtype=cfg.gen_dtype))
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.default_temp = default_temp
        self.mesh = mesh
        # Multi-process mesh (VERDICT r4 #4): when the mesh spans hosts,
        # generation runs as one SPMD program — streams shard over the
        # global `data` axis, every host participates in every device call
        # with identical inputs, and the note outputs come back REPLICATED
        # (the all-gather rides ICI inside the chunk executable) so each
        # host reads the full result locally.  Deviation #10 keeps the
        # bytes equal to the single-process run: stream g's uniforms are a
        # pure function of (seed, global index, t), independent of where
        # the batch is placed (tests/test_multiprocess.py pins 2-process
        # byte-equality to the solo run).
        self._mp = (mesh is not None and
                    len({d.process_index for d in mesh.devices.flat}) > 1)
        self._global_fns = None

    # -- one timestep ------------------------------------------------------

    def _note_scan(self, params: Params, feats: jax.Array,
                   style_emb: jax.Array, temperature: jax.Array,
                   us: jax.Array) -> jax.Array:
        """Sample all pitches for one timestep.

        feats: [G, N, time_units], us: [G, N, 2] per-stream uniforms (drawn
        in `_step` from the stream-indexed keys).  Returns [G, N, 3].
        The pitch recurrence and the sampling interleave: note n's LSTM input
        includes the SAMPLED note n-1 (ref: generate.py:112-118) — but as a
        single on-device scan, not 48 predict calls.
        """
        G = feats.shape[0]
        N = feats.shape[1]
        model = self.model
        cfg = self.cfg

        if (cfg.fused_gen_kernel and model._kernel() == "pallas"
                and len(params.note_axis) == 2
                and G <= cfg.fused_gen_max_batch
                and not cfg.gen_volume_quantize):
            # (The fused kernel doesn't implement volume quantization —
            # the scan path below is the quantizing one.)
            # The whole pitch loop (2 LSTM layers + heads + temperature +
            # Bernoulli compares) as ONE Pallas invocation.  Wins for small
            # generation batches (0.46 vs 0.62 ms/step single-stream at 32
            # bars, f32 discipline); at G=64 the two paths measure within
            # noise of each other under f32 (2.17 vs 2.22 ms — the old
            # XLA-wins-at-large-G gap was bf16-only), so the gate simply
            # keeps the fused kernel where it has something to win
            # (docs/PERFORMANCE.md).
            from music_generator_tpu.ops.pallas_notegen import (
                pallas_note_sample)
            return pallas_note_sample(
                feats, us, temperature, params.note_axis[0],
                params.note_axis[1], params.note_dense, params.volume_dense,
                style_emb, compute_dtype=model._dt(),
                recurrent_activation=cfg.lstm_recurrent_activation)

        note_state = model.init_note_state(G)

        def body(carry, inp):
            note_state, prev_chosen = carry
            feat_n, u_n = inp                         # [G, time_units], [G, 2]
            pred, note_state = model.note_axis_cell(
                params, feat_n, prev_chosen, style_emb, note_state)
            probs = apply_temperature(pred[:, :2], temperature[:, None])
            play = (u_n[:, 0] <= probs[:, 0]).astype(jnp.float32)
            replay = (u_n[:, 1] <= probs[:, 1]).astype(jnp.float32) * play
            # Deliberate deviation from the reference: the raw linear volume
            # head is clipped to [0, 1] before the copy-through.  The
            # reference copies it unclipped (ref: generate.py:48,55) and can
            # emit MIDI velocities >127 or negative — invalid bytes the
            # encoder would have to truncate anyway.  Pinned by
            # tests/test_generation.py::test_volume_clip_is_deliberate.
            volume = jnp.clip(pred[:, 2], 0.0, 1.0)
            if cfg.gen_volume_quantize:
                # Opt-in deviation #9: snap to the 1/127 velocity grid
                # (config.py `gen_volume_quantize` documents the
                # knife-edge trade; test_volume_quantization pins it).
                # Gather from a host-computed true-division table: an
                # on-device `x/127` gets rewritten to multiply-by-
                # reciprocal, whose 1-ULP-low results mis-truncate 8 of
                # the 128 grid points back through the encoder's
                # int(v*max_velocity); the f32(k/max_velocity) table
                # truncates losslessly for every k.
                mv = cfg.max_velocity
                k = jnp.round(volume * float(mv)).astype(jnp.int32)
                volume = jnp.asarray(_velocity_grid(mv))[k]
            volume = volume * play
            chosen = jnp.stack([play, replay, volume], axis=-1)   # [G, 3]
            return (note_state, chosen), chosen

        xs = (feats.transpose(1, 0, 2), us.transpose(1, 0, 2))
        (_, _), notes = jax.lax.scan(
            body, (note_state, jnp.zeros((G, 3))), xs)
        return notes.transpose(1, 0, 2)               # [G, N, 3]

    def _step_uniforms(self, stream_keys: jax.Array,
                       t: jax.Array) -> jax.Array:
        """Deviation #10 (docs/MIGRATION.md): each stream's step-t uniforms
        come from fold_in(stream_key, t) — a pure function of
        (seed, global stream index, t).  Sampled bytes are therefore
        independent of the batch SHAPE (mesh/bucket padding) and of the
        batch COMPOSITION (what the other streams are): the auto-mesh
        padded run is byte-equal to the unpadded single-chip run, and
        stream i of a sweep equals the solo run at stream_offset=i.  The
        pre-r4 scheme drew one [G, N, 2] block from a split-per-step
        chain, which entangled every stream with the padded shape
        (VERDICT r3 weak #2).  Returns [G, N, 2]."""
        step_keys = jax.vmap(jax.random.fold_in, (0, None))(stream_keys, t)
        return jax.vmap(
            lambda k: jax.random.uniform(k, (self.cfg.num_notes, 2)))(
                step_keys)

    def _beat_row(self, t: jax.Array, G: int) -> jax.Array:
        """Beat alignment: the model input pairs the note consumed at step t
        (the one chosen at t-1) with the beat of timestep t-1 — the same
        (note[j], beat[j]) pairing the training windows use (dataset.stagger)
        and the reference generator feeds (ref: generate.py:73-79 appends the
        step-t note together with compute_beat(t), so predicting step t sees
        note[t-1] + beat[t-1]).  At t=0 the zero-initialized memory slot has
        an all-zero beat row."""
        cfg = self.cfg
        beat = jax.nn.one_hot((t - 1) % cfg.notes_per_bar, cfg.notes_per_bar)
        beat = beat * (t > 0)
        return jnp.broadcast_to(beat[None], (G, cfg.notes_per_bar))

    def _temperature_update(self, state: StepState,
                            note_t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Adaptive temperature (ref: generate.py:60-71): +0.1 per silent
        step once a full bar has been silent; reset to default on any note.
        Returns (temperature, silent_time) after observing note_t."""
        silent = jnp.sum(note_t, axis=(1, 2)) == 0
        silent_time = jnp.where(silent, state.silent_time + 1, 0)
        bump = silent & (silent_time >= self.cfg.notes_per_bar)
        temperature = jnp.where(
            bump, state.temperature + 0.1,
            jnp.where(silent, state.temperature, state.base_temp))
        return temperature, silent_time

    def _step(self, params: Params, style_emb: jax.Array,
              state: StepState, t: jax.Array,
              us: Optional[jax.Array] = None,
              ) -> Tuple[StepState, jax.Array]:
        G = style_emb.shape[0]
        beat = self._beat_row(t, G)

        feats, time_state = self.model.time_axis_step(
            params, state.prev_note, beat, style_emb, state.time_state)

        # `us` is normally pre-drawn for the whole chunk in one batched
        # threefry dispatch (see _chunk_jit) — bitwise the same values as
        # the in-step draw below, which remains for direct _step callers.
        if us is None:
            us = self._step_uniforms(state.stream_keys, t)
        next_note = self._note_scan(params, feats, style_emb,
                                    state.temperature, us)

        temperature, silent_time = self._temperature_update(state, next_note)
        return StepState(time_state, next_note, temperature, state.base_temp,
                         silent_time, state.stream_keys), next_note

    # -- whole piece -------------------------------------------------------

    def _init_state(self, G: int, seed, temperature,
                    stream_offset: int = 0,
                    seeds: Optional[np.ndarray] = None,
                    stream_indices: Optional[np.ndarray] = None) -> StepState:
        cfg = self.cfg
        # Stream g's key is fold_in(key(seed), stream_offset + g): a global
        # per-stream identity, so the uniforms (and hence the bytes) of a
        # stream never depend on which batch it rides in (deviation #10).
        # `seeds`/`stream_indices` override the per-stream (seed, index)
        # pair individually — the coalescing hook: fold_in(key(seeds[g]),
        # indices[g]) is computed per element, so a stream's key (and bytes)
        # equal the solo run of that (seed, index) no matter what else rides
        # in the batch.
        if stream_indices is None:
            idx = jnp.arange(stream_offset, stream_offset + G,
                             dtype=jnp.uint32)
        else:
            idx = jnp.asarray(stream_indices, jnp.uint32)
        if seeds is None:
            stream_keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.key(seed), idx)
        else:
            stream_keys = jax.vmap(
                lambda s, i: jax.random.fold_in(jax.random.key(s), i))(
                    jnp.asarray(seeds, jnp.uint32), idx)
        # Scalar or per-stream [G] temperature; one strong-f32 construction
        # for both cases so every caller shares one compiled signature.
        temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (G,))
        return StepState(
            time_state=self.model.init_time_state(G),
            prev_note=jnp.zeros((G, cfg.num_notes, cfg.note_units)),
            temperature=temp,
            base_temp=temp,
            # A fresh generation counts as already silent for a bar
            # (ref: generate.py:24 inits silent_time = NOTES_PER_BAR).
            silent_time=jnp.full((G,), cfg.notes_per_bar, jnp.int32),
            stream_keys=stream_keys,
        )

    # -- multi-process SPMD variants (VERDICT r4 #4) -------------------------

    def _stage_rows(self, arr: np.ndarray) -> jax.Array:
        """Host array → global array sharded on dim 0 over the mesh.
        `make_array_from_callback` materializes only this process's
        addressable shards, so it is multi-process safe; every host passes
        the identical full array (the same SPMD convention the trainer's
        replicated inputs rely on)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        arr = np.asarray(arr)
        sh = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    def _mp_fns(self):
        """Build (once) the explicit-sharding executables for a mesh that
        spans processes.  `_chunk_jit`/`_prime_*_jit` infer their devices
        from input placement, which only works single-process; across hosts
        every input needs a declared sharding: params replicated, the
        per-stream state and prime rows sharded on the stream axis, and the
        chunk's note outputs REPLICATED — the all-gather runs inside the
        executable over ICI, and every host then reads the full (fully-
        replicated, hence locally addressable) result without a second
        collective.  The traced bodies are the SAME methods the
        single-process path jits, so the math (and the bytes) cannot
        drift between the two deployments."""
        if self._global_fns is not None:
            return self._global_fns
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh
        repl = NamedSharding(mesh, P())
        row = NamedSharding(mesh, P(mesh.axis_names[0]))
        model, cfg = self.model, self.cfg

        def setup(seeds, idx, temps):
            # Mirrors _init_state exactly: fold_in(key(seeds[g]), idx[g])
            # per element (deviation #10) — a homogeneous batch passes
            # seeds full of the scalar seed, which is bitwise the same keys
            # as _init_state's fold_in(key(seed), idx); the rest of the
            # state is zeros/constants.  Everything here is integer or
            # constant math, hence bit-exact however XLA fuses it — the
            # one FLOAT computation of generation setup, the style
            # embedding, deliberately stays OUT of this jit: generate()
            # computes it eagerly on the host's default device (the same
            # op-by-op programs the certified single-process run executes,
            # so the values are bitwise identical) and stages the result.
            stream_keys = jax.vmap(
                lambda s, i: jax.random.fold_in(jax.random.key(s), i))(
                    seeds, idx)
            G = seeds.shape[0]
            return StepState(
                time_state=model.init_time_state(G),
                prev_note=jnp.zeros((G, cfg.num_notes, cfg.note_units)),
                temperature=temps,
                base_temp=temps,
                silent_time=jnp.full((G,), cfg.notes_per_bar, jnp.int32),
                stream_keys=stream_keys)

        setup_jit = jax.jit(setup,
                            in_shardings=(repl, repl, repl),
                            out_shardings=row)

        chunk_cache = {}

        def chunk(params, style_emb, state, num_steps, t0):
            fn = chunk_cache.get(num_steps)
            if fn is None:
                fn = jax.jit(
                    lambda p, e, s, t, _n=num_steps:
                        self._chunk_body(p, e, s, _n, t),
                    in_shardings=(repl, row, row, repl),
                    out_shardings=(row, repl))
                chunk_cache[num_steps] = fn
            return fn(params, style_emb, state, t0)

        prime_scan = jax.jit(self._prime_scan_body,
                             in_shardings=(repl, row, row, row, repl),
                             out_shardings=row)
        prime_tail = jax.jit(self._prime_tail_body,
                             in_shardings=(repl, row, row, row, repl, repl),
                             out_shardings=row)
        self._global_fns = (setup_jit, chunk, prime_scan, prime_tail)
        return self._global_fns

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _chunk_jit(self, params: Params, style_emb: jax.Array,
                   state: StepState, num_steps: int,
                   t0: jax.Array) -> Tuple[StepState, Tuple]:
        return self._chunk_body(params, style_emb, state, num_steps, t0)

    def _chunk_body(self, params: Params, style_emb: jax.Array,
                    state: StepState, num_steps: int,
                    t0: jax.Array) -> Tuple[StepState, Tuple]:
        """One compiled chunk of `num_steps` timesteps starting at t0.
        Chunks chain through StepState, so any total length reuses the same
        executable — true O(1)-state streaming decode (BASELINE config 5).

        Returns the chunk's notes as (playreplay_u8 [G,C,N], volume_f32
        [G,C,N]): play/replay are exact {0,1} floats, so packing the pair
        into one uint8 plane (play + 2*replay) is lossless while cutting
        the device→host payload 2.4x — which matters because the G=64
        transfer, not the compute, dominated the generation headline
        through this box's relay (runs/probe_gen.json: 0.8 ms/step of
        compute inside a 2.4 ms/step total; D2H measured at 9-26 MB/s)."""
        def scan_body(state, xs):
            t, us = xs
            return self._step(params, style_emb, state, t, us)

        # Highest matmul precision: on TPU, f32 matmuls otherwise run as
        # single-pass bf16 on the MXU, which shifts probabilities enough to
        # flip Bernoulli draws vs a CPU run (the byte-identity target).
        ts = t0 + jnp.arange(num_steps, dtype=jnp.int32)
        # Hoist the RNG off the scan's critical path: all of the chunk's
        # per-(stream, t) uniforms in ONE batched threefry dispatch — the
        # same fold_in(stream_key, t) keys and draws as the per-step form
        # (bitwise identical), but ~128 small sequential hashes become one
        # large parallel one (runs/probe_gen.json priced the in-scan RNG
        # at 0.13 ms/step of the 1.4 ms step).
        us_all = jax.vmap(self._step_uniforms, (None, 0))(
            state.stream_keys, ts)                    # [C, G, N, 2]
        with jax.default_matmul_precision(self.cfg.gen_matmul_precision):
            state, notes = jax.lax.scan(scan_body, state, (ts, us_all))
        notes = notes.transpose(1, 0, 2, 3)           # [G, C, N, 3]
        playreplay = (notes[..., 0] + 2.0 * notes[..., 1]).astype(jnp.uint8)
        vol = notes[..., 2]
        if self.cfg.gen_compact_transfer:
            # Velocity byte instead of the raw f32 (config.py
            # gen_compact_transfer): same .mid bytes, 2.5x less payload.
            vol = jnp.floor(vol * float(self.cfg.max_velocity)).astype(
                jnp.uint8)
        return state, (playreplay, vol)

    def _prime_body(self, params: Params, style_emb: jax.Array):
        """The shared teacher-forcing scan body: advance the time-axis
        recurrence with exactly the inputs `_step` would use had the model
        SAMPLED this note — prev_note paired with beat(t-1), the
        adaptive-temperature machine observing each row.  No randomness is
        consumed: the note-axis sampling is skipped entirely, and
        continuation uniforms remain fold_in(stream_key, t) at the
        absolute step index (deviation #10)."""
        def body(state, xs):
            t, note_t = xs
            beat = self._beat_row(t, note_t.shape[0])
            _, time_state = self.model.time_axis_step(
                params, state.prev_note, beat, style_emb, state.time_state)
            temperature, silent_time = self._temperature_update(state, note_t)
            new = StepState(time_state, note_t, temperature,
                            state.base_temp, silent_time, state.stream_keys)
            return new, new
        return body

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prime_scan_jit(self, params: Params, style_emb: jax.Array,
                        state: StepState, notes_chunk: jax.Array,
                        t0: jax.Array) -> StepState:
        return self._prime_scan_body(params, style_emb, state, notes_chunk,
                                     t0)

    def _prime_scan_body(self, params: Params, style_emb: jax.Array,
                         state: StepState, notes_chunk: jax.Array,
                         t0: jax.Array) -> StepState:
        """Teacher-force a FULL chunk of ground-truth notes (every row
        valid) through the streaming state — the priming half of primed
        continuation (a capability the reference's window-recompute
        generator has no analogue for; its `MusicGeneration` deque always
        starts from silence, ref: generate.py:18-20).

        Carry-only: returns the final state, no per-step stacking (the
        stacked tape measured +70 ms PER DISPATCH through this box's
        relay — runs/serving_bench.json's primed workload motivated the
        split into big/bar/tail executables; `_advance_through_prime`)."""
        body = self._prime_body(params, style_emb)
        ts = t0 + jnp.arange(notes_chunk.shape[1], dtype=jnp.int32)
        with jax.default_matmul_precision(self.cfg.gen_matmul_precision):
            state, _ = jax.lax.scan(
                body, state, (ts, notes_chunk.transpose(1, 0, 2, 3)))
        return state

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prime_tail_jit(self, params: Params, style_emb: jax.Array,
                        state: StepState, notes_chunk: jax.Array,
                        t0: jax.Array, n_valid: jax.Array) -> StepState:
        return self._prime_tail_body(params, style_emb, state, notes_chunk,
                                     t0, n_valid)

    def _prime_tail_body(self, params: Params, style_emb: jax.Array,
                         state: StepState, notes_chunk: jax.Array,
                         t0: jax.Array, n_valid: jax.Array) -> StepState:
        """The partial final chunk: notes_chunk is [G, BAR, N, 3] with only
        the first `n_valid` rows real (zero-padded tail); the scan stacks
        each step's carry and `n_valid` selects the state to keep.

        A variable-length tail scan is NOT equivalent: XLA fully unrolls a
        length-1 scan and fuses its body differently, and the resulting
        ~1e-7 float drift in the LSTM state can flip a knife-edge Bernoulli
        compare downstream (observed on CPU) — bitwise identity demands
        every prime step go through byte-identical body codegen, so the
        tail pads up to the same bar-sized scan the full chunks use."""
        body = self._prime_body(params, style_emb)
        ts = t0 + jnp.arange(notes_chunk.shape[1], dtype=jnp.int32)
        with jax.default_matmul_precision(self.cfg.gen_matmul_precision):
            _, stacked = jax.lax.scan(
                body, state, (ts, notes_chunk.transpose(1, 0, 2, 3)))
        return jax.tree.map(lambda s: s[n_valid - 1], stacked)

    # Full prime chunks dispatch at this many bars per call (matching
    # generate()'s default chunk_bars): through this box's relay each
    # dispatch costs ~90 ms regardless of size, so an 8-bar prime is ONE
    # call instead of eight (runs/serving_bench.json).
    _PRIME_CHUNK_BARS = 8

    def _advance_through_prime(self, style_emb: jax.Array, state: StepState,
                               prime: np.ndarray) -> StepState:
        """Run the prime through at most three compiled signatures — big
        (8-bar) and bar-sized carry-only scans for the full chunks, the
        stacked-select bar scan for a partial tail.  Compiles through this
        box's TPU relay cost minutes and dispatches ~90 ms, so both
        signature count AND dispatch count matter.  All three run the
        identical per-step body (`_prime_body`): chunking never changes
        the resulting state (test_prime_self_consistency and the
        committed primed-demo byte pins hold across chunk patterns)."""
        bar = self.cfg.notes_per_bar
        big = bar * self._PRIME_CHUNK_BARS
        if self._mp:
            _, _, prime_scan, prime_tail = self._mp_fns()
        t = 0
        total = prime.shape[1]
        while t < total:
            left = total - t
            if left >= big:
                n = big
            elif left >= bar:
                n = bar
            else:
                chunk = np.concatenate(
                    [prime[:, t:], np.zeros(
                        prime.shape[:1] + (bar - left,) + prime.shape[2:],
                        prime.dtype)], axis=1)
                if self._mp:
                    return prime_tail(self.params, style_emb, state,
                                      self._stage_rows(chunk), np.int32(t),
                                      np.int32(left))
                return self._prime_tail_jit(
                    self.params, style_emb, state, jnp.asarray(chunk),
                    jnp.int32(t), jnp.int32(left))
            if self._mp:
                state = prime_scan(self.params, style_emb, state,
                                   self._stage_rows(prime[:, t:t + n]),
                                   np.int32(t))
            else:
                state = self._prime_scan_jit(
                    self.params, style_emb, state,
                    jnp.asarray(prime[:, t:t + n]), jnp.int32(t))
            t += n
        return state

    def _assemble(self, pulled_pr: np.ndarray,
                  pulled_vol: np.ndarray) -> np.ndarray:
        """Host-side inverse of the packed transfer — bit-exact for play
        and replay ({0.0, 1.0} floats reconstruct identically); volumes
        are raw f32 by default, or the exact grid float of the transferred
        velocity byte under gen_compact_transfer."""
        play = (pulled_pr & 1).astype(np.float32)
        replay = ((pulled_pr >> 1) & 1).astype(np.float32)
        if pulled_vol.dtype == np.uint8:
            pulled_vol = _velocity_grid(self.cfg.max_velocity)[pulled_vol]
        return np.stack([play, replay, np.asarray(pulled_vol, np.float32)],
                        axis=-1)

    def _begin_streams(self, styles, seed, temperature, stream_offset,
                       pad_to, seeds, stream_indices):
        """Validate + pad the stream batch, compute the style embedding,
        and build the initial per-stream carry — everything `generate`
        does before its chunk loop, shared with `begin` (the incremental
        surface serving's time-sliced scheduler drives).  Returns
        (style_emb, state, styles_np, G_real)."""
        if not styles:
            # `styles[-1]` in the pad expression below would otherwise
            # raise an opaque IndexError (review r4).
            raise ValueError("at least one style mixture is required")
        if not 0 <= int(seed) < 2 ** 32:
            # jnp.uint32(seed) under NumPy 2 raises OverflowError for
            # out-of-range ints — surface the contract as a ValueError the
            # CLI prints cleanly and serving maps to HTTP 400 (review r4).
            raise ValueError(f"seed must be in [0, 2**32), got {seed}")
        G_real = len(styles)
        styles = list(styles)
        pad_mult = pad_to or 1
        if self.mesh is not None:
            pad_mult = max(pad_mult,
                           int(np.prod(self.mesh.devices.shape)))
        pad = (-G_real) % pad_mult
        styles = styles + [styles[-1]] * pad

        def _per_stream(vals, name, dtype, lo=None, hi=None):
            """Validate + pad a per-stream sequence (pad rows repeat the
            last real stream, like the styles — they're sliced off)."""
            vals = [dtype(v) for v in vals]
            if len(vals) != G_real:
                raise ValueError(f"{name} must have one entry per style "
                                 f"mixture ({G_real}), got {len(vals)}")
            for v in vals:
                if lo is not None and not lo <= v < hi:
                    raise ValueError(
                        f"each {name} entry must be in [{lo}, {hi}), got {v}")
            return np.asarray(vals + [vals[-1]] * pad)

        if seeds is not None:
            seeds = _per_stream(seeds, "seeds", int, 0, 2 ** 32).astype(
                np.uint32)
        if stream_indices is not None:
            stream_indices = _per_stream(stream_indices, "stream_indices",
                                         int, 0, 2 ** 32).astype(np.uint32)
        styles_np = np.stack(styles).astype(np.float32)
        if self._mp:
            # The embedding is computed EAGERLY on this host's default
            # device — op-for-op the same programs the single-process
            # paths execute — then staged row-sharded onto the global
            # mesh.  (Folding it into the setup jit measured an extra
            # 5.7e-8 fusion drift on top of the certified sharding drift;
            # keeping it eager keeps the multi-process volumes within the
            # same knife-edge envelope the single-process mesh path
            # certifies — the contract binds at .mid bytes,
            # docs/FIDELITY.md.)
            with jax.default_matmul_precision(self.cfg.gen_matmul_precision):
                emb_local = self.model.style_embedding(
                    self.params, jnp.asarray(styles_np))
            style_emb = self._stage_rows(np.asarray(emb_local))
        else:
            styles_arr = jnp.asarray(styles_np)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                axis = self.mesh.axis_names[0]
                styles_arr = jax.device_put(
                    styles_arr, NamedSharding(self.mesh, P(axis)))
            with jax.default_matmul_precision(self.cfg.gen_matmul_precision):
                style_emb = self.model.style_embedding(self.params,
                                                       styles_arr)

        if temperature is None:
            temp = self.default_temp
        elif np.ndim(temperature) == 0:
            temp = float(temperature)
        else:
            temp = _per_stream(temperature, "temperature", float).astype(
                np.float32)
        if self._mp:
            # Normalize to per-stream (seed, index, temperature) arrays —
            # identical math to _init_state's scalar forms (see _mp_fns).
            G_pad = styles_np.shape[0]
            seeds_full = (seeds if seeds is not None
                          else np.full(G_pad, seed, np.uint32))
            idx_full = (stream_indices if stream_indices is not None
                        else np.arange(stream_offset, stream_offset + G_pad,
                                       dtype=np.uint32))
            temps_full = np.broadcast_to(np.asarray(temp, np.float32),
                                         (G_pad,))
            setup_jit, _, _, _ = self._mp_fns()
            state = setup_jit(seeds_full, idx_full, temps_full)
        else:
            state = self._init_state(styles_np.shape[0], jnp.uint32(seed),
                                     temp, stream_offset, seeds=seeds,
                                     stream_indices=stream_indices)
        return style_emb, state, styles_np, G_real

    def begin(self, styles: Sequence[np.ndarray], *, chunk_bars: int = 8,
              seed: int = 0, temperature=None, stream_offset: int = 0,
              pad_to: Optional[int] = None,
              seeds: Optional[Sequence[int]] = None,
              stream_indices: Optional[Sequence[int]] = None,
              ) -> "ActiveGeneration":
        """Open an INCREMENTAL generation: same stream semantics as
        `generate` (per-stream (seed, index, temperature) triples, mesh /
        bucket padding), but the caller drives the chunk loop one slice at
        a time via the returned handle's `advance()` — between slices the
        recurrent carry simply stays parked in device memory.

        This is the hook behind serving's time-sliced scheduler
        (continuous batching): a long request's device time is consumed in
        bounded chunk-sized slices, so a short interactive request only
        ever waits for the slice in flight, never a whole long piece.
        Byte contract: `begin(...)` followed by `advance()` calls produces
        the EXACT bytes of `generate(..., pad_partial_chunk=True,
        chunk_bars=chunk_bars)` — it runs the same chunk executables at
        the same absolute steps (deviation #10 uniforms are step-indexed),
        whatever the slicing (pinned by
        tests/test_generation.py::test_begin_advance_matches_generate)."""
        style_emb, state, styles_np, G_real = self._begin_streams(
            styles, seed, temperature, stream_offset, pad_to, seeds,
            stream_indices)
        chunk_steps = self.cfg.notes_per_bar * chunk_bars
        return ActiveGeneration(self, style_emb, state, styles_np, G_real,
                                chunk_steps)

    def generate(self, styles: Sequence[np.ndarray], num_bars: int = 32,
                 seed: int = 0, chunk_bars: int = 8,
                 temperature=None,
                 stream_offset: int = 0,
                 pad_to: Optional[int] = None,
                 prime: Optional[np.ndarray] = None,
                 pad_partial_chunk: bool = False,
                 seeds: Optional[Sequence[int]] = None,
                 stream_indices: Optional[Sequence[int]] = None,
                 ) -> GenerationResult:
        """Generate `num_bars` bars for each style mixture, entirely
        on-device (ref: generate.py:98-121's API, minus the host loop).

        The piece streams in fixed-size compiled chunks: unbounded --bars
        never recompiles, and the recurrent/temperature/RNG state crosses
        chunk boundaries exactly (chunking does not change the output).
        `temperature` is a traced runtime value — varying it never triggers
        a recompile (one Sampler serves any temperature).

        With a mesh, a batch that doesn't divide the device count is padded
        with copies of the last style mixture to the next multiple (the
        same bucket trick serving uses) and the padding is sliced off the
        result — G=3 genre mixtures run fine on 8 chips.  Since deviation
        #10 the per-stream uniforms are indexed by (seed, stream_offset + g,
        t), NOT drawn as one batch-shaped block — so the padded auto-mesh
        run is byte-equal to the unpadded single-chip run, and stream g here
        equals a solo run of the same mixture at stream_offset=g
        (tests/test_generation.py pins both; certified cross-backend by
        tools/check_fidelity.py's mesh variant).

        `pad_to` additionally pads the batch to a multiple of that size
        even without a mesh — the serving bucket / certification hook.

        `prime`: an optional CLAMPED piano roll ([T_p, num_notes, 3] shared
        by every stream, or [G, T_p, num_notes, 3] per-stream) that the
        model continues FROM: the streaming state is teacher-forced through
        it (no sampling, no randomness consumed), then `num_bars` bars are
        generated starting at absolute step T_p.  The result contains the
        continuation only — callers concatenate the prime back if they want
        the full piece (`prepend_prime`; cli.generate_main does).

        `pad_partial_chunk`: run the final partial chunk at the FULL
        chunk length and slice the surplus steps off.  Byte-identical
        output (the scan is causal and deviation #10's uniforms are
        indexed by absolute step, so a kept prefix is unaffected by how
        far past it the scan ran) at the cost of up to chunk_bars-1 bars
        of discarded compute — worth it wherever a compile stalls the
        caller: _chunk_jit's step count is STATIC, so every distinct tail
        length is otherwise its own multi-minute relay compile (serving
        always opts in; pinned by
        test_generation.py::test_pad_partial_chunk_is_byte_identical).

        `seeds` / `stream_indices` / a per-stream `temperature` sequence
        give each stream its OWN (seed, global index, temperature) triple
        — the coalescing hook behind serving's dynamic request batching:
        stream g's bytes equal the solo run
        `generate([styles[g]], seed=seeds[g], stream_offset=indices[g],
        temperature=temps[g])` exactly (deviation #10 keys are computed
        per element; the adaptive-temperature machine is per-stream
        already), so heterogeneous requests can share one device call
        byte-transparently.  Each must have len(styles) entries; both
        default to the homogeneous `seed` / `stream_offset + g` scheme."""
        cfg = self.cfg
        if num_bars < 0:
            # Otherwise the chunk loop never runs and the assembly below
            # dereferences None (review r4: `--bars -1` raised an opaque
            # TypeError; serving clamps independently, the CLI doesn't).
            raise ValueError(f"num_bars must be >= 0, got {num_bars}")
        style_emb, state, styles_np, G_real = self._begin_streams(
            styles, seed, temperature, stream_offset, pad_to, seeds,
            stream_indices)
        if self._mp:
            _, chunk_fn, _, _ = self._mp_fns()
        gen_steps = cfg.notes_per_bar * num_bars
        num_steps = gen_steps
        if pad_partial_chunk:
            chunk = cfg.notes_per_bar * chunk_bars
        else:
            chunk = min(num_steps, cfg.notes_per_bar * chunk_bars)
        prime_steps = 0
        if prime is not None and prime.shape[-3] > 0:
            prime = np.asarray(prime, np.float32)
            G_pad = styles_np.shape[0]
            if prime.ndim == 3:
                prime = np.broadcast_to(prime[None], (G_pad,) + prime.shape)
            elif prime.shape[0] != G_real:
                # Validate against the REAL stream count, not the padded
                # batch: on a mesh (G_pad > G_real) a count in
                # (G_real, G_pad] used to be silently wrap-padded and the
                # extra primes attached to padding streams that are sliced
                # off — same call raised on a single chip (review r4).
                raise ValueError(
                    f"prime has {prime.shape[0]} streams but "
                    f"{G_real} style mixtures were given")
            elif prime.shape[0] != G_pad:       # pad like the styles were
                prime = np.concatenate(
                    [prime] + [prime[-1:]] * (G_pad - prime.shape[0]))
            prime_steps = prime.shape[1]
            state = self._advance_through_prime(style_emb, state, prime)
        # Chunk pipeline: dispatch chunk k+1 (which only depends on chunk
        # k's on-device carry) BEFORE pulling chunk k's notes to the host,
        # so the D2H transfer — the dominant cost at large G through this
        # box's relay — overlaps the next chunk's compute.  Pure
        # scheduling: outputs are identical to the serial loop.
        if num_steps == 0:           # num_bars=0: e.g. "just run the prime"
            return GenerationResult(
                np.zeros((G_real, 0, cfg.num_notes, cfg.note_units),
                         np.float32),
                styles_np[:G_real])
        pieces = []
        pending = None
        t = prime_steps
        num_steps += prime_steps
        while t < num_steps:
            n = chunk if pad_partial_chunk else min(chunk, num_steps - t)
            if self._mp:
                state, out = chunk_fn(self.params, style_emb, state, n,
                                      np.int32(t))
            else:
                state, out = self._chunk_jit(self.params, style_emb, state,
                                             n, jnp.int32(t))
            if pending is not None:
                pieces.append(self._assemble(np.asarray(pending[0]),
                                             np.asarray(pending[1])))
            pending = out
            t += n
        pieces.append(self._assemble(np.asarray(pending[0]),
                                     np.asarray(pending[1])))
        notes = np.concatenate(pieces, axis=1)[:G_real, :gen_steps]
        return GenerationResult(notes, styles_np[:G_real])


class ActiveGeneration:
    """An open incremental generation: per-stream carry parked on device
    between `advance()` calls.  Create via `Sampler.begin`."""

    def __init__(self, sampler: Sampler, style_emb, state, styles_np,
                 G_real: int, chunk_steps: int):
        self._sampler = sampler
        self._style_emb = style_emb
        self._state = state
        self.styles_np = styles_np
        self.G_real = G_real
        self.chunk_steps = chunk_steps
        self.t = 0                     # absolute step of the next chunk

    def advance(self, num_chunks: int = 1) -> np.ndarray:
        """Run `num_chunks` full compiled chunks and return their notes,
        assembled, real streams only: [G_real, num_chunks*chunk_steps,
        num_notes, 3].  The carry advances; successive calls continue the
        same pieces."""
        s = self._sampler
        pieces = []
        for _ in range(num_chunks):
            if s._mp:
                _, chunk_fn, _, _ = s._mp_fns()
                self._state, out = chunk_fn(s.params, self._style_emb,
                                            self._state, self.chunk_steps,
                                            np.int32(self.t))
            else:
                self._state, out = s._chunk_jit(s.params, self._style_emb,
                                                self._state,
                                                self.chunk_steps,
                                                jnp.int32(self.t))
            pieces.append(s._assemble(np.asarray(out[0]),
                                      np.asarray(out[1]))[:self.G_real])
            self.t += self.chunk_steps
        return np.concatenate(pieces, axis=1)

    def close(self) -> None:
        """Release the parked device state (the handle is unusable
        after).  Serving calls this when a job finishes; the multi-host
        replay proxy also ships it so followers free their handles."""
        self._state = None
        self._style_emb = None


def prepend_prime(notes: np.ndarray, prime: np.ndarray) -> np.ndarray:
    """Full-piece view of a primed generation: the (clamped) prime followed
    by the continuation, per stream.  A 3-d prime (shared by all streams)
    broadcasts across the batch; a 4-d prime is per-stream already.  One
    implementation serves both the CLI and serving (review r4: the two
    surfaces had drifted-prone copies)."""
    prime = np.asarray(prime, np.float32)
    if prime.ndim == 3:
        prime = np.broadcast_to(prime[None],
                                (notes.shape[0],) + prime.shape)
    return np.concatenate([prime, notes], axis=1)


def write_file(name: str, result: GenerationResult,
               config: Optional[Config] = None) -> list:
    """Write one .mid per generation to cfg.samples_dir
    (ref: generate.py:123-134)."""
    cfg = config or Config()
    paths = []
    for i in range(result.notes.shape[0]):
        fpath = os.path.join(cfg.samples_dir, f"{name}_{i}.mid")
        os.makedirs(os.path.dirname(fpath), exist_ok=True)
        print("Writing file", fpath)
        mf = midi_encode(unclamp_midi(result.notes[i], cfg), config=cfg)
        write_midifile(fpath, mf)
        paths.append(fpath)
    return paths
