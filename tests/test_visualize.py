"""Content-level tests for the style-embedding visualizer
(cli.visualize_main — ref: visualize.py): the two TSVs must contain the
actual 'style' layer embeddings and the genre/artist label table."""

import os

import numpy as np

import jax

from music_generator_tpu.cli import visualize_main
from music_generator_tpu.config import default_config
from music_generator_tpu.models.deepj import DeepJ, init_params


def test_visualize_writes_correct_tsvs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # out/ is cwd-relative, like the ref
    visualize_main([])

    cfg = default_config()
    vec = np.loadtxt("out/style_embedding_vec.tsv", delimiter="\t")
    assert vec.shape == (cfg.num_styles, cfg.style_units)

    # With no checkpoint present, build_or_load fresh-initializes from seed
    # 0 — the vectors must BE the 'style' Dense layer outputs on the
    # identity (ref: visualize.py:16-23), not junk.
    model = DeepJ(cfg)
    params = init_params(jax.random.key(0), cfg)
    expected = np.asarray(model.style_embedding(
        params, np.identity(cfg.num_styles, dtype=np.float32)))
    np.testing.assert_allclose(vec, expected, atol=1e-4)

    lines = open("out/style_embedding_labels.tsv").read().splitlines()
    assert lines[0] == "Genre\tArtist"
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) == cfg.num_styles
    # Genre column blocks match the taxonomy; artist column is the style
    # directory basename (ref: visualize.py:26-43).
    i = 0
    for genre, styles in zip(cfg.genres, cfg.styles):
        for style_dir in styles:
            assert rows[i] == [genre, os.path.basename(style_dir)]
            i += 1


def test_visualize_from_keras(tmp_path, monkeypatch):
    """--from-keras: a reference user's model.h5 drives the TSVs directly
    (the committed trained artifact doubles as the genuine-layout
    fixture)."""
    import pytest
    pytest.importorskip("h5py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h5 = os.path.join(repo, "artifacts", "trained_model_r3", "model.h5")
    monkeypatch.chdir(tmp_path)
    visualize_main(["--from-keras", h5])

    cfg = default_config()
    vec = np.loadtxt("out/style_embedding_vec.tsv", delimiter="\t")
    from music_generator_tpu.training.keras_import import load_keras_weights
    params = load_keras_weights(h5, cfg)
    expected = np.asarray(DeepJ(cfg).style_embedding(
        params, np.identity(cfg.num_styles, dtype=np.float32)))
    np.testing.assert_allclose(vec, expected, atol=1e-4)
