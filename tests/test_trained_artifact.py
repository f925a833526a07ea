"""The committed trained-model artifact (artifacts/trained_model_r3/) —
the analogue of the reference's published `archives/v1/model.h5`
(ref: .MISSING_LARGE_BLOBS:8).

Pins three claims: the npz and Keras-h5 exports carry identical weights;
the canonical checkpoint generates style-faithful music (not noise); and
the published short samples (artifacts/short_samples_r2/, generated on
the TPU chip) regenerate BYTE-IDENTICALLY on CPU from the committed
weights — the cross-backend fidelity discipline (docs/FIDELITY.md) is
what makes a published sample a reproducible artifact rather than a
screenshot."""

import os

import numpy as np
import pytest

import jax

from music_generator_tpu.config import default_config
from music_generator_tpu.data.dataset import compute_genre, unclamp_midi
from music_generator_tpu.data.synth import pitch_class_histogram, synth_piece
from music_generator_tpu.generation.sampler import Sampler
from music_generator_tpu.midi.codec import midi_encode
from music_generator_tpu.midi.io import write_midifile
from music_generator_tpu.models.deepj import DeepJ, init_params
from music_generator_tpu.utils import one_hot

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "trained_model_r3")
SHORT = os.path.join(os.path.dirname(ART), "short_samples_r2")


def _load_npz(model, path):
    template = init_params(jax.random.key(0), model.cfg)
    data = np.load(path)
    leaves_kv = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in leaves_kv[0]]
    return jax.tree_util.tree_unflatten(leaves_kv[1], leaves)


@pytest.fixture(scope="module")
def flagship():
    cfg = default_config()
    return cfg, DeepJ(cfg)


def test_npz_and_h5_exports_agree(flagship):
    """params.npz and model.h5 are the same checkpoint, leaf for leaf
    (the h5 goes through the genuine-Keras-layout writer/reader)."""
    pytest.importorskip("h5py")
    from music_generator_tpu.training.keras_import import load_keras_weights
    cfg, model = flagship
    p_npz = _load_npz(model, os.path.join(ART, "params.npz"))
    p_h5 = load_keras_weights(os.path.join(ART, "model.h5"), cfg)
    for a, b in zip(jax.tree.leaves(p_npz), jax.tree.leaves(p_h5)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trained_checkpoint_is_style_faithful(flagship):
    """8 bars conditioned on three single styles: substantial note output
    whose pitch-class mass lands in the conditioning style's scale family
    (same scoring as tools/run_convergence.py; thresholds far above the
    ~1/3 chance overlap of unrelated scales).  Generation is seed-exact,
    so the assertion is deterministic.  (Recalibrated in round 4 when
    deviation #10 changed the sampled draws: 8 bars instead of 4 to
    stabilize the per-style counts, seed 1 measures n=424/449/428 notes
    and own-scale overlap 0.837/0.931/0.862 — comfortably above the
    thresholds.)"""
    cfg, model = flagship
    params = _load_npz(model, os.path.join(ART, "params.npz"))
    sampler = Sampler(model, params)
    sids = (0, 7, 14)
    res = sampler.generate([one_hot(s, cfg.num_styles) for s in sids],
                           num_bars=8, seed=1)
    notes = np.asarray(res.notes)
    for i, s in enumerate(sids):
        roll = notes[i]
        n_notes = int((roll[..., 0] > 0).sum())
        h_gen = pitch_class_histogram(roll)
        h_own = pitch_class_histogram(
            synth_piece(s, bars=8, seed=0, config=cfg)
            [:, cfg.min_note:cfg.max_note])
        own = float(np.minimum(h_gen, h_own).sum())
        assert n_notes >= 200, f"style {s}: only {n_notes} notes"
        assert own >= 0.75, f"style {s}: own-scale overlap {own:.3f}"


@pytest.mark.slow
def test_real_corpus_samples_regenerate_byte_identically(flagship, tmp_path):
    """artifacts/real_corpus_r3/ — the model trained on the reference's
    nine REAL published pieces (docs/TRAINING.md "Real-corpus training"):
    its TPU-generated samples reproduce byte-for-byte on CPU from the
    committed weights (16 bars, seed 0, T=0.75, styles 0/3/9 — the first
    composer slot of each genre)."""
    cfg, model = flagship
    art = os.path.join(os.path.dirname(ART), "real_corpus_r3")
    params = _load_npz(model, os.path.join(art, "params.npz"))
    sampler = Sampler(model, params)
    sids = [0, 3, 9]
    res = sampler.generate([one_hot(s, cfg.num_styles) for s in sids],
                           num_bars=16, seed=0, temperature=0.75)
    for i in range(3):
        out = tmp_path / f"regen_{i}.mid"
        write_midifile(str(out),
                       midi_encode(unclamp_midi(np.asarray(res.notes[i]),
                                                cfg), config=cfg))
        published = os.path.join(art, f"real_trained_{i}.mid")
        assert out.read_bytes() == open(published, "rb").read(), \
            f"real_trained_{i}.mid does not regenerate byte-identically"


@pytest.mark.slow
def test_published_short_samples_regenerate_byte_identically(
        flagship, tmp_path):
    """artifacts/short_samples_r2/short_s0_*.mid were generated on the TPU
    chip through the stock CLI; the same sampling math on CPU from the
    committed params_short23.npz reproduces them byte for byte."""
    cfg, model = flagship
    params = _load_npz(model, os.path.join(ART, "params_short23.npz"))
    sampler = Sampler(model, params)
    styles = [compute_genre(g, cfg) for g in range(3)]
    res = sampler.generate(styles, num_bars=8, seed=0)
    for i in range(3):
        out = tmp_path / f"regen_{i}.mid"
        write_midifile(str(out),
                       midi_encode(unclamp_midi(np.asarray(res.notes[i]),
                                                cfg), config=cfg))
        published = os.path.join(SHORT, f"short_s0_{i}.mid")
        assert out.read_bytes() == open(published, "rb").read(), \
            f"short_s0_{i}.mid does not regenerate byte-identically"


@pytest.mark.slow
def test_primed_demo_regenerates_byte_identically(flagship, tmp_path):
    """artifacts/primed_demos_r4/primed_Baroque.mid — the real-corpus
    model continuing the reference's published 'Baroque 1' from its first
    8 bars (tools/make_primed_demos.py, generated on the TPU chip) —
    regenerates byte-for-byte on CPU: the fidelity discipline extends to
    the primed-continuation surface end-to-end (published piece → codec →
    teacher-forced state → continuation → encoder)."""
    from music_generator_tpu.data.dataset import clamp_midi
    from music_generator_tpu.midi.codec import midi_decode
    from music_generator_tpu.midi.io import read_midifile

    cfg, model = flagship
    art = os.path.join(os.path.dirname(ART), "primed_demos_r4")
    src = "/root/reference/archives/v1/long_samples/Baroque 1.mid"
    if not os.path.exists(src):
        pytest.skip("reference published pieces not available")
    params = _load_npz(model, os.path.join(
        os.path.dirname(ART), "real_corpus_r3", "params.npz"))
    roll = clamp_midi(midi_decode(read_midifile(src), cfg.midi_max_notes,
                                  config=cfg), cfg)
    prime = roll[:8 * cfg.notes_per_bar].astype(np.float32)
    res = Sampler(model, params).generate(
        [one_hot(0, cfg.num_styles)], num_bars=8, seed=0,
        temperature=0.75, prime=prime)
    out = tmp_path / "regen.mid"
    write_midifile(str(out), midi_encode(
        unclamp_midi(np.concatenate([prime, res.notes[0]]), cfg),
        config=cfg))
    published = os.path.join(art, "primed_Baroque.mid")
    assert out.read_bytes() == open(published, "rb").read(), \
        "primed_Baroque.mid does not regenerate byte-identically"


ART_R4 = os.path.join(os.path.dirname(ART), "trained_model_r4")


def test_r4_npz_and_h5_exports_agree(flagship):
    """trained_model_r4: params.npz and model.h5 carry identical weights."""
    pytest.importorskip("h5py")
    from music_generator_tpu.training.keras_import import load_keras_weights
    cfg, model = flagship
    p_npz = _load_npz(model, os.path.join(ART_R4, "params.npz"))
    p_h5 = load_keras_weights(os.path.join(ART_R4, "model.h5"), cfg)
    for a, b in zip(jax.tree.leaves(p_npz), jax.tree.leaves(p_h5)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_r4_checkpoint_is_style_faithful_and_replays(flagship):
    """The round-4 flagship (trained on the replay-correct corpus,
    docs/TRAINING.md) generates style-faithful music whose replay head
    FIRES — the property every earlier synth-trained checkpoint lacks
    (their corpora round-tripped through the reference codec's frame-grid
    quirk, erasing all replay targets).  Same probe as the r3 test
    (8 bars, seed 1, styles 0/7/14); measured: notes 495/322/454,
    own-scale overlap 0.597/0.698/0.605, replay rate 0.065/0.028/0.033.
    The r3 checkpoint on the identical probe: replay rate exactly 0 on
    all three streams (pinned below as the control)."""
    cfg, model = flagship
    sids = (0, 7, 14)
    mixtures = [one_hot(s, cfg.num_styles) for s in sids]

    params = _load_npz(model, os.path.join(ART_R4, "params.npz"))
    res = Sampler(model, params).generate(mixtures, num_bars=8, seed=1)
    notes = np.asarray(res.notes)
    for i, s in enumerate(sids):
        roll = notes[i]
        n_notes = int((roll[..., 0] > 0).sum())
        h_gen = pitch_class_histogram(roll)
        h_own = pitch_class_histogram(
            synth_piece(s, bars=8, seed=0, config=cfg)
            [:, cfg.min_note:cfg.max_note])
        own = float(np.minimum(h_gen, h_own).sum())
        replay = float(roll[..., 1].sum())
        assert n_notes >= 200, f"style {s}: only {n_notes} notes"
        assert own >= 0.5, f"style {s}: own-scale overlap {own:.3f}"
        assert replay > 0, f"style {s}: replay head never fired"

    # Control: the r3 checkpoint (replay-erased corpus) fires NO replay
    # on the identical probe.
    params_r3 = _load_npz(model, os.path.join(ART, "params.npz"))
    res_r3 = Sampler(model, params_r3).generate(mixtures, num_bars=8, seed=1)
    assert float(np.asarray(res_r3.notes)[..., 1].sum()) == 0.0


@pytest.mark.slow
def test_r4_short_samples_regenerate_from_the_committed_h5(flagship,
                                                           tmp_path):
    """artifacts/short_samples_r4/ were generated on the TPU chip through
    the UNMODIFIED stock CLI from the committed Keras-layout h5
    (PROVENANCE.json — the README quickstart, literally).  The same
    sampling from the h5-loaded weights on CPU reproduces every byte:
    the reference-migration path (model.h5) carries the full fidelity
    contract."""
    pytest.importorskip("h5py")
    from music_generator_tpu.training.keras_import import load_keras_weights
    cfg, model = flagship
    art = os.path.join(os.path.dirname(ART), "short_samples_r4")
    params = load_keras_weights(os.path.join(ART_R4, "model.h5"), cfg)
    sampler = Sampler(model, params)
    styles = [compute_genre(g, cfg) for g in range(3)]
    for seed in (0, 1):
        res = sampler.generate(styles, num_bars=8, seed=seed)
        for i in range(3):
            out = tmp_path / f"regen_{seed}_{i}.mid"
            write_midifile(str(out),
                           midi_encode(unclamp_midi(np.asarray(res.notes[i]),
                                                    cfg), config=cfg))
            published = os.path.join(art, f"short_s{seed}_{i}.mid")
            assert out.read_bytes() == open(published, "rb").read(), \
                f"short_s{seed}_{i}.mid does not regenerate byte-identically"
