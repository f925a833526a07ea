"""Generation tests: the on-device sampler's determinism, shape/value
contracts, adaptive-temperature semantics, and the full roll→MIDI write path
(BASELINE config 1: random-init generation must produce valid .mid files)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_generator_tpu import midi
from music_generator_tpu.config import test_config as small_config
from music_generator_tpu.data.dataset import compute_genre
from music_generator_tpu.generation.sampler import Sampler, write_file
from music_generator_tpu.models.deepj import DeepJ, init_params

CFG = small_config()


@pytest.fixture(scope="module")
def sampler():
    model = DeepJ(CFG)
    params = init_params(jax.random.key(0), CFG)
    return Sampler(model, params)


def test_generate_shapes_and_values(sampler):
    styles = [compute_genre(i, CFG) for i in range(3)]
    result = sampler.generate(styles, num_bars=2, seed=0)
    G, T, N, C = result.notes.shape
    assert (G, T, N, C) == (3, 2 * CFG.notes_per_bar, CFG.num_notes, 3)
    play = result.notes[..., 0]
    replay = result.notes[..., 1]
    vol = result.notes[..., 2]
    assert set(np.unique(play)) <= {0.0, 1.0}
    assert set(np.unique(replay)) <= {0.0, 1.0}
    # Replay only where played; volume only where played; volume in [0, 1].
    assert (replay <= play).all()
    assert ((vol > 0) <= (play > 0)).all()
    assert (vol >= 0).all() and (vol <= 1).all()


def test_generate_deterministic_per_seed(sampler):
    styles = [compute_genre(0, CFG)]
    a = sampler.generate(styles, num_bars=2, seed=7)
    b = sampler.generate(styles, num_bars=2, seed=7)
    np.testing.assert_array_equal(a.notes, b.notes)
    c = sampler.generate(styles, num_bars=2, seed=8)
    assert not np.array_equal(a.notes, c.notes)


def test_write_file_produces_parseable_midi(sampler, tmp_path):
    cfg = CFG.replace(out_dir=str(tmp_path / "out"))
    styles = [compute_genre(i, CFG) for i in range(2)]
    result = sampler.generate(styles, num_bars=1, seed=0)
    paths = write_file("output", result, cfg)
    assert len(paths) == 2
    for i, p in enumerate(paths):
        assert p.endswith(f"output_{i}.mid")
        assert os.path.exists(p)
        pattern = midi.read_midifile(p)
        assert pattern.resolution == cfg.notes_per_beat
        assert len(pattern) >= 1


def test_fixed_seed_midi_bytes_stable(sampler, tmp_path):
    """The byte-identity target (BASELINE.md): same seed → byte-identical
    .mid output."""
    cfg = CFG.replace(out_dir=str(tmp_path / "out"))
    styles = [compute_genre(0, CFG)]
    r1 = sampler.generate(styles, num_bars=2, seed=3)
    p1 = write_file("a", r1, cfg)[0]
    r2 = sampler.generate(styles, num_bars=2, seed=3)
    p2 = write_file("b", r2, cfg)[0]
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_adaptive_temperature_rises_when_silent():
    """Force near-zero play probability via a strongly negative play-head
    bias: the temperature must climb 0.1 per silent step
    (ref: generate.py:60-71; initial silent_time is a full bar)."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(1), CFG)
    # Push play/replay logits very negative so nothing fires.
    params = params._replace(
        note_dense=params.note_dense._replace(
            bias=params.note_dense.bias - 30.0,
            kernel=params.note_dense.kernel * 0.0))
    sampler = Sampler(model, params)

    styles = jnp.asarray(np.stack([compute_genre(0, CFG)]), jnp.float32)
    style_emb = sampler.model.style_embedding(params, styles)
    state = sampler._init_state(1, jnp.uint32(0), 1.0)
    temps = []
    for t in range(4):
        state, _ = sampler._step(params, style_emb, state,
                                 jnp.asarray(t, jnp.int32))
        temps.append(float(state.temperature[0]))
    np.testing.assert_allclose(temps, [1.1, 1.2, 1.3, 1.4], rtol=1e-6)


def test_generation_streaming_matches_teacher_forced_forward(sampler):
    """The sampler's own outputs, fed back through the batched training
    graph as teacher-forced targets, must reproduce the sampler's
    probabilities — the train/generate parity contract."""
    model, params = sampler.model, sampler.params
    styles = [compute_genre(0, CFG)]
    result = sampler.generate(styles, num_bars=1, seed=11)
    notes = result.notes                       # [1, T, N, 3]
    T = notes.shape[1]

    # Inputs at step t are the notes sampled at t-1 (zeros at t=0), paired
    # with the beat of timestep t-1 — the training alignment (stagger pairs
    # beat[j] with input note[j]; the zero-padded leading window rows carry
    # all-zero beats, hence the zero row at t=0).
    inputs = np.concatenate([np.zeros_like(notes[:, :1]), notes[:, :-1]], 1)
    beat = np.array(jax.nn.one_hot((np.arange(T) - 1) % CFG.notes_per_bar,
                                   CFG.notes_per_bar))[None]
    beat[:, 0] = 0.0
    style_rows = np.repeat(np.stack(styles)[:, None], T, axis=1)

    preds = model.forward(params, jnp.asarray(inputs), jnp.asarray(notes),
                          jnp.asarray(beat, jnp.float32),
                          jnp.asarray(style_rows, jnp.float32))
    # Where the sampler says played, the batched graph must agree the
    # volume prediction that was copied (clipped) matches.
    play = notes[..., 0] > 0
    clip = np.clip(np.asarray(preds[..., 2]), 0, 1)
    np.testing.assert_allclose(notes[..., 2][play], clip[play], atol=1e-4)


def test_mesh_sharded_generation_matches_unsharded():
    """Sharding the generation batch over the 8-device mesh must not change
    the sampled output (the recurrences are independent per generation)."""
    from music_generator_tpu.parallel.mesh import make_mesh
    model = DeepJ(CFG)
    params = init_params(jax.random.key(2), CFG)
    styles = [compute_genre(i % 3, CFG) for i in range(8)]

    plain = Sampler(model, params).generate(styles, num_bars=1, seed=4)
    meshed = Sampler(model, params, mesh=make_mesh()).generate(
        styles, num_bars=1, seed=4)
    # Partitioned execution can reorder float accumulations, so volumes can
    # differ in the last few ULPs; the sampled events must match exactly.
    np.testing.assert_array_equal(plain.notes[..., :2], meshed.notes[..., :2])
    np.testing.assert_allclose(plain.notes[..., 2], meshed.notes[..., 2],
                               atol=1e-5)


def test_mesh_generation_pads_non_dividing_batch():
    """G=3 genre mixtures on an 8-device mesh (the CLI default on a
    v5e-8): the sampler pads the batch to mesh divisibility with copies of
    the last style and slices the padding off.  Since deviation #10 the
    per-stream uniforms are indexed by global stream id, so the parity
    oracle is the UNPADDED plain run — the auto-mesh default and the
    certified single-device run sample the same pieces."""
    from music_generator_tpu.parallel.mesh import make_mesh
    model = DeepJ(CFG)
    params = init_params(jax.random.key(2), CFG)
    styles = [compute_genre(i, CFG) for i in range(3)]

    meshed = Sampler(model, params, mesh=make_mesh()).generate(
        styles, num_bars=1, seed=4)
    assert meshed.notes.shape[0] == 3 and meshed.styles.shape[0] == 3

    plain = Sampler(model, params).generate(styles, num_bars=1, seed=4)
    np.testing.assert_array_equal(plain.notes[..., :2],
                                  meshed.notes[..., :2])
    np.testing.assert_allclose(plain.notes[..., 2],
                               meshed.notes[..., 2], atol=1e-5)
    np.testing.assert_array_equal(plain.styles, meshed.styles)


def _mid_bytes(roll):
    """Encode one [T, N, 3] roll to .mid bytes in memory."""
    import io
    from music_generator_tpu.data.dataset import unclamp_midi
    from music_generator_tpu.midi.codec import midi_encode
    buf = io.BytesIO()
    midi.write_midifile(buf, midi_encode(unclamp_midi(np.asarray(roll), CFG),
                                         config=CFG))
    return buf.getvalue()


def test_stream_rng_shape_and_composition_invariance():
    """Deviation #10's contract, at the byte level: the same stream samples
    the same .mid bytes whether it runs solo (G=1 at its stream_offset),
    in the stock G=3 batch, padded to 8 without a mesh, or through the
    8-device auto-mesh (the flagship v5e-8 default).  The uniforms are an
    exact function of (seed, global stream index, t); the forward pass is
    deterministic per backend, so this equality is pinned exactly."""
    from music_generator_tpu.parallel.mesh import make_mesh
    model = DeepJ(CFG)
    params = init_params(jax.random.key(2), CFG)
    styles = [compute_genre(i, CFG) for i in range(3)]
    s = Sampler(model, params)

    g3 = s.generate(styles, num_bars=2, seed=9)
    ref_bytes = [_mid_bytes(g3.notes[i]) for i in range(3)]

    pad8 = s.generate(styles, num_bars=2, seed=9, pad_to=8)
    meshed = Sampler(model, params, mesh=make_mesh()).generate(
        styles, num_bars=2, seed=9)
    for i in range(3):
        solo = s.generate([styles[i]], num_bars=2, seed=9, stream_offset=i)
        assert _mid_bytes(solo.notes[0]) == ref_bytes[i], f"solo {i}"
        assert _mid_bytes(pad8.notes[i]) == ref_bytes[i], f"pad8 {i}"
        assert _mid_bytes(meshed.notes[i]) == ref_bytes[i], f"mesh {i}"


def test_per_stream_triples_match_solo_runs(sampler):
    """The coalescing hook: per-stream (seed, index, temperature) triples
    make a heterogeneous batch byte-equal, stream by stream, to the solo
    runs of those triples — the property serving's dynamic request
    batching rests on.  Includes the bars slice: a stream generated to the
    batch's max bars, cut at its own length, equals its solo run at that
    length (causal scan + absolute-step uniforms)."""
    styles = [compute_genre(i % 3, CFG) for i in range(3)]
    seeds = [5, 9, 5]
    temps = [1.0, 0.8, 1.3]
    co = sampler.generate(styles, num_bars=2, seeds=seeds,
                          stream_indices=[0, 0, 0], temperature=temps,
                          pad_to=4, pad_partial_chunk=True)
    spb = CFG.notes_per_bar
    for i in range(3):
        solo = sampler.generate([styles[i]], num_bars=2, seed=seeds[i],
                                temperature=temps[i])
        assert _mid_bytes(co.notes[i]) == _mid_bytes(solo.notes[0]), f"s{i}"
        short = sampler.generate([styles[i]], num_bars=1, seed=seeds[i],
                                 temperature=temps[i])
        assert (_mid_bytes(co.notes[i, :spb])
                == _mid_bytes(short.notes[0])), f"prefix {i}"
    # Streams 0 and 2 share (seed, index) but not temperature — they must
    # differ; with ALL coordinates equal they would be identical streams.
    assert _mid_bytes(co.notes[0]) != _mid_bytes(co.notes[2])


def test_per_stream_validation(sampler):
    styles = [compute_genre(0, CFG), compute_genre(1, CFG)]
    with pytest.raises(ValueError, match="seeds"):
        sampler.generate(styles, num_bars=1, seeds=[1])
    with pytest.raises(ValueError, match="seeds"):
        sampler.generate(styles, num_bars=1, seeds=[1, 2 ** 32])
    with pytest.raises(ValueError, match="stream_indices"):
        sampler.generate(styles, num_bars=1, stream_indices=[0, -1])
    with pytest.raises(ValueError, match="temperature"):
        sampler.generate(styles, num_bars=1, temperature=[1.0])


def test_prime_self_consistency(sampler):
    """Priming with the model's OWN first K bars reproduces the rest of the
    run byte-for-byte: teacher-forcing the streaming state through notes the
    model really did sample is indistinguishable from having sampled them
    (and the continuation's uniforms key off absolute t — deviation #10)."""
    styles = [compute_genre(0, CFG)]
    full = sampler.generate(styles, num_bars=4, seed=11)
    K = 2 * CFG.notes_per_bar
    cont = sampler.generate(styles, num_bars=2, seed=11,
                            prime=full.notes[0, :K])
    np.testing.assert_array_equal(cont.notes[0], full.notes[0, K:])


def test_prime_non_bar_aligned_and_per_stream(sampler):
    """A prime whose length is not a multiple of the bar (exercising the
    single-step tail chunks) and a per-stream [G, T_p, N, 3] prime both
    continue exactly like the original run."""
    styles = [compute_genre(i, CFG) for i in range(2)]
    full = sampler.generate(styles, num_bars=4, seed=13)
    K = CFG.notes_per_bar + 3
    cont = sampler.generate(styles, num_bars=2, seed=13,
                            prime=full.notes[:, :K])
    T = 2 * CFG.notes_per_bar
    np.testing.assert_array_equal(cont.notes, full.notes[:, K:K + T])


def test_prime_big_bar_tail_chunk_mix(sampler):
    """A prime long enough to exercise ALL THREE prime executables (the
    8-bar carry-only big chunk, the bar-sized carry-only chunk, and the
    stacked-select partial tail) continues exactly like the original run
    — chunking never changes the state (the dispatch-count optimization
    is bitwise-neutral)."""
    styles = [compute_genre(1, CFG)]
    npb = CFG.notes_per_bar
    full = sampler.generate(styles, num_bars=11, seed=23)
    K = 8 * npb + npb + 3                 # big + bar + 3-step tail
    cont = sampler.generate(styles, num_bars=1, seed=23,
                            prime=full.notes[0, :K])
    np.testing.assert_array_equal(cont.notes[0], full.notes[0, K:K + npb])


def test_prime_padding_invariance(sampler):
    """Bucket padding doesn't change primed bytes (the deviation-#10
    contract extends to the teacher-forced prefix: priming consumes no
    randomness at all)."""
    styles = [compute_genre(0, CFG)]
    full = sampler.generate(styles, num_bars=3, seed=17)
    K = CFG.notes_per_bar
    a = sampler.generate(styles, num_bars=2, seed=17,
                         prime=full.notes[0, :K])
    b = sampler.generate(styles, num_bars=2, seed=17,
                         prime=full.notes[0, :K], pad_to=4)
    np.testing.assert_array_equal(a.notes, b.notes)
    np.testing.assert_array_equal(a.notes[0], full.notes[0, K:])


def test_prime_mesh_matches_unsharded(sampler):
    """Primed continuation on the 8-device auto-mesh path (the flagship
    default, with G=1 padded to 8) samples the same events as the plain
    single-device primed run."""
    from music_generator_tpu.parallel.mesh import make_mesh
    styles = [compute_genre(0, CFG)]
    full = sampler.generate(styles, num_bars=3, seed=19)
    K = CFG.notes_per_bar + 5
    prime = full.notes[0, :K]
    plain = sampler.generate(styles, num_bars=1, seed=19, prime=prime)
    meshed = Sampler(sampler.model, sampler.params,
                     mesh=make_mesh()).generate(
        styles, num_bars=1, seed=19, prime=prime)
    np.testing.assert_array_equal(plain.notes[..., :2],
                                  meshed.notes[..., :2])
    np.testing.assert_allclose(plain.notes[..., 2], meshed.notes[..., 2],
                               atol=1e-5)


def test_prime_with_more_streams_than_styles_rejected(sampler):
    styles = [compute_genre(0, CFG)]
    bad = np.zeros((4, CFG.notes_per_bar, CFG.num_notes, 3), np.float32)
    with pytest.raises(ValueError, match="more.*streams|streams but"):
        sampler.generate(styles, num_bars=1, seed=0, prime=bad)


def test_prime_stream_mismatch_rejected_even_under_padding(sampler):
    """A per-stream prime count that differs from the REAL style count must
    raise even when batch padding would make room for it (review r4: on a
    mesh, 6 primes for 3 styles padded to 8 were silently accepted and
    primes 3-5 attached to padding streams that get sliced off)."""
    styles = [compute_genre(i % 3, CFG) for i in range(3)]
    bad = np.zeros((6, CFG.notes_per_bar, CFG.num_notes, 3), np.float32)
    with pytest.raises(ValueError, match="streams but"):
        sampler.generate(styles, num_bars=1, seed=0, prime=bad, pad_to=8)
    too_few = bad[:2]
    with pytest.raises(ValueError, match="streams but"):
        sampler.generate(styles, num_bars=1, seed=0, prime=too_few)


def test_zero_bars_returns_empty_result(sampler):
    """--bars 0 (e.g. 'just run the prime') returns an empty roll instead
    of crashing in the transfer-pipeline drain."""
    styles = [compute_genre(0, CFG)]
    res = sampler.generate(styles, num_bars=0, seed=0)
    assert res.notes.shape == (1, 0, CFG.num_notes, 3)


def test_negative_bars_rejected(sampler):
    """num_bars < 0 raises a clear ValueError instead of dereferencing the
    never-filled transfer pipeline (review r4: --bars -1 crashed with
    'NoneType' is not subscriptable)."""
    styles = [compute_genre(0, CFG)]
    with pytest.raises(ValueError, match="num_bars"):
        sampler.generate(styles, num_bars=-1, seed=0)


def test_chunked_streaming_equals_monolithic(sampler):
    """Chunk size must not change the generated piece — the recurrent,
    temperature, and RNG state cross chunk boundaries exactly."""
    styles = [compute_genre(0, CFG), compute_genre(1, CFG)]
    whole = sampler.generate(styles, num_bars=4, seed=13, chunk_bars=4)
    chunked = sampler.generate(styles, num_bars=4, seed=13, chunk_bars=1)
    np.testing.assert_array_equal(whole.notes, chunked.notes)


def test_volume_clip_is_deliberate():
    """Deliberate deviation from the reference: the linear volume head is
    clipped to [0, 1] before copy-through (the ref emits it raw,
    generate.py:48,55, producing invalid MIDI velocities).  Force the head
    to output > 1 and assert every played note's volume is exactly 1.0."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(5), CFG)
    params = params._replace(
        volume_dense=params.volume_dense._replace(
            kernel=params.volume_dense.kernel * 0.0,
            bias=params.volume_dense.bias + 3.0),
        # Make sure plenty of notes fire.
        note_dense=params.note_dense._replace(
            bias=params.note_dense.bias + 5.0))
    result = Sampler(model, params).generate(
        [compute_genre(0, CFG)], num_bars=1, seed=0)
    play = result.notes[..., 0] > 0
    assert play.any()
    np.testing.assert_array_equal(result.notes[..., 2][play], 1.0)


def test_volume_quantization(tmp_path):
    """Opt-in deviation #9 (Config.gen_volume_quantize): sampled volumes
    land exactly on the 1/127 velocity grid, OFF by default (the published
    certified artifacts pin raw copy-through), and the emitted velocity
    byte is then a lossless function of the stored float."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(3), CFG)
    # Plenty of notes, mid-range volumes.
    params = params._replace(
        note_dense=params.note_dense._replace(
            bias=params.note_dense.bias + 5.0))
    style = [compute_genre(0, CFG)]

    plain = Sampler(model, params).generate(style, num_bars=1, seed=0)
    played = plain.notes[..., 0] > 0
    assert played.any()
    grid = np.round(plain.notes[..., 2] * 127.0) / 127.0
    # Default OFF: the raw head output is generally NOT grid-aligned.
    assert not np.allclose(plain.notes[..., 2], grid)

    qmodel = DeepJ(CFG.replace(gen_volume_quantize=True))
    quant = Sampler(qmodel, params).generate(style, num_bars=1, seed=0)
    # All stored volumes are exact f32 grid points k/127 (true-division
    # table; an on-device division would land 1 ULP off for some k).
    v = np.asarray(quant.notes[..., 2], np.float32)
    k = np.round(v * np.float32(127.0))
    grid = np.arange(128, dtype=np.float32) / np.float32(127.0)
    np.testing.assert_array_equal(v, grid[k.astype(np.int32)])
    # Lossless byte round-trip: the encoder's int(v*127) truncation
    # recovers exactly k for every emitted value.
    np.testing.assert_array_equal(np.floor(v * np.float32(127.0)), k)


def test_temperature_is_traced_no_recompile():
    """One sampler serves every temperature with one compiled executable
    (round-1 advisor finding: per-temperature samplers recompiled)."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(6), CFG)
    sampler = Sampler(model, params)
    styles = [compute_genre(0, CFG)]

    Sampler._chunk_jit._clear_cache()
    hot = sampler.generate(styles, num_bars=2, seed=1, temperature=1.0)
    n_compiles = Sampler._chunk_jit._cache_size()
    cold = sampler.generate(styles, num_bars=2, seed=1, temperature=5.0)
    assert Sampler._chunk_jit._cache_size() == n_compiles
    # Different temperatures change the sampled piece.
    assert not np.array_equal(hot.notes, cold.notes)


def test_fused_gen_kernel_matches_scan_interpret():
    """The fused pitch-loop kernel (interpret mode) reproduces the XLA scan
    path: identical probabilities ⇒ identical draws off knife edges."""
    from jax.experimental.pallas import tpu as pltpu
    cfg_fused = small_config(lstm_kernel="pallas", fused_gen_kernel=True,
                             fused_axis_kernel=False)
    model_f = DeepJ(cfg_fused)
    model_x = DeepJ(CFG)     # xla path
    params = init_params(jax.random.key(4), CFG)
    s_x = Sampler(model_x, params)
    s_f = Sampler(model_f, params)

    styles = jnp.asarray(np.stack([compute_genre(0, CFG),
                                   compute_genre(2, CFG)]), jnp.float32)
    emb = model_x.style_embedding(params, styles)
    feats, _ = model_x.time_axis_step(
        params, jnp.zeros((2, CFG.num_notes, 3)),
        jnp.zeros((2, CFG.notes_per_bar)), emb, model_x.init_time_state(2))
    us = jax.random.uniform(jax.random.key(21), (2, CFG.num_notes, 2))
    # Both T=1 and a tempered run: the kernel must apply the same
    # division-form temperature math as apply_temperature (the hardware
    # byte-identity certification at --temperature 0.9 is the exact pin;
    # docs/FIDELITY.md).
    for t in (1.0, 0.9):
        temp = jnp.full((2,), t)
        ref = s_x._note_scan(params, feats, emb, temp, us)
        with pltpu.force_tpu_interpret_mode():
            fused = s_f._note_scan(params, feats, emb, temp, us)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                                   atol=1e-4)


def test_compact_transfer_same_midi_bytes():
    """gen_compact_transfer (config.py) ships the velocity byte
    floor(v*127) as uint8 instead of the raw f32 volume.  The encoder
    truncates int(v*127) and every f32(k/127) grid point truncates back
    to its own k, so the EMITTED .mid bytes must be identical; the
    returned roll's volumes become the exact grid float of the raw
    output's velocity byte (serving relies on this to cut the
    device->host payload 2.5x with provably unchanged responses)."""
    model = DeepJ(CFG)
    params = init_params(jax.random.key(2), CFG)
    styles = [compute_genre(g, CFG) for g in range(3)]
    raw = Sampler(model, params).generate(styles, num_bars=2, seed=5)
    compact = Sampler(DeepJ(CFG.replace(gen_compact_transfer=True)),
                      params).generate(styles, num_bars=2, seed=5)
    # play/replay bit-exact; volume = grid[floor(raw*127)]
    np.testing.assert_array_equal(raw.notes[..., :2], compact.notes[..., :2])
    grid = np.arange(128, dtype=np.float32) / np.float32(127.0)
    expect = grid[np.floor(raw.notes[..., 2] * 127.0).astype(np.int32)]
    np.testing.assert_array_equal(compact.notes[..., 2], expect)
    for i in range(3):
        assert _mid_bytes(raw.notes[i]) == _mid_bytes(compact.notes[i]), i


def test_pad_partial_chunk_is_byte_identical(sampler):
    """pad_partial_chunk runs the final chunk at FULL length and slices the
    surplus — serving's one-executable-per-bucket guarantee rests on the
    sliced output being byte-equal to the exact-length run (the scan is
    causal; deviation #10's uniforms are indexed by absolute step)."""
    styles = [compute_genre(0, CFG), compute_genre(1, CFG)]
    exact = sampler.generate(styles, num_bars=3, seed=5, chunk_bars=2)
    padded = sampler.generate(styles, num_bars=3, seed=5, chunk_bars=2,
                              pad_partial_chunk=True)
    assert padded.notes.shape == exact.notes.shape
    np.testing.assert_array_equal(exact.notes, padded.notes)
    # With a prime whose length leaves a mid-chunk generation tail too.
    prime = exact.notes[:, :CFG.notes_per_bar // 2]
    e2 = sampler.generate(styles, num_bars=1, seed=5, chunk_bars=2,
                          prime=prime)
    p2 = sampler.generate(styles, num_bars=1, seed=5, chunk_bars=2,
                          prime=prime, pad_partial_chunk=True)
    np.testing.assert_array_equal(e2.notes, p2.notes)


def test_begin_advance_matches_generate(sampler):
    """The incremental surface (Sampler.begin / ActiveGeneration.advance —
    serving's time-sliced scheduler hook): chunks driven one slice at a
    time, with the carry parked on device between calls, produce the EXACT
    bytes of one generate() call over the same span, however the advance
    calls are grouped."""
    styles = [compute_genre(0, CFG), compute_genre(2, CFG)]
    spb = CFG.notes_per_bar
    whole = sampler.generate(styles, num_bars=6, seed=11, chunk_bars=2,
                             temperature=[1.0, 0.8], seeds=[11, 12],
                             stream_indices=[3, 7],
                             pad_partial_chunk=True)
    gen = sampler.begin(styles, chunk_bars=2, temperature=[1.0, 0.8],
                        seeds=[11, 12], stream_indices=[3, 7])
    # 3 chunks of 2 bars, driven as 1 + 2: slicing must be invisible.
    part1 = gen.advance(1)
    part2 = gen.advance(2)
    assert part1.shape[1] == 2 * spb and part2.shape[1] == 4 * spb
    np.testing.assert_array_equal(
        np.concatenate([part1, part2], axis=1), whole.notes)


def test_out_of_range_seed_rejected(sampler):
    """jnp.uint32 would raise an opaque OverflowError under NumPy 2 for
    seeds outside [0, 2^32); the sampler surfaces the contract as a
    ValueError that the CLI prints cleanly and serving maps to HTTP 400."""
    styles = [compute_genre(0, CFG)]
    for bad in (-1, 2 ** 32):
        with pytest.raises(ValueError, match="seed"):
            sampler.generate(styles, num_bars=1, seed=bad)


def test_empty_styles_rejected(sampler):
    with pytest.raises(ValueError, match="style mixture"):
        sampler.generate([], num_bars=1)


def test_prepend_prime_shared_and_per_stream():
    from music_generator_tpu.generation.sampler import prepend_prime
    notes = np.zeros((3, 4, CFG.num_notes, 3), np.float32)
    shared = np.ones((2, CFG.num_notes, 3), np.float32)
    full = prepend_prime(notes, shared)
    assert full.shape == (3, 6, CFG.num_notes, 3)
    np.testing.assert_array_equal(full[:, :2], 1.0)
    per_stream = np.stack([shared * (i + 1) for i in range(3)])
    full2 = prepend_prime(notes, per_stream)
    np.testing.assert_array_equal(full2[2, :2], 3.0)
