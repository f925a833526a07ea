"""CLI argument-handling tests (generate_main's style-mixture logic —
ref: generate.py:137-148 — without running the model; the /verify skill
drives the CLIs for real)."""

import numpy as np
import pytest

import music_generator_tpu.cli as cli
from music_generator_tpu.config import default_config

CFG = default_config()


@pytest.fixture()
def captured(monkeypatch):
    """Stub the heavy pieces; record what generate_main hands the sampler."""
    rec = {}

    class FakeSampler:
        def __init__(self, model, params, default_temp=1.0, mesh=None):
            rec["temp"] = default_temp
            rec["mesh"] = mesh

        def generate(self, styles, num_bars, seed):
            rec["styles"] = [np.asarray(s) for s in styles]
            rec["bars"] = num_bars
            rec["seed"] = seed
            return "result"

    monkeypatch.setattr(cli, "Sampler", FakeSampler)
    monkeypatch.setattr(cli, "build_or_load", lambda model: ("params", True))
    monkeypatch.setattr(cli, "write_file",
                        lambda name, result, cfg: rec.setdefault("out", name))
    return rec


def test_generate_default_is_three_genre_mixtures(captured):
    cli.generate_main([])
    assert len(captured["styles"]) == 3           # ref: generate.py:144
    for g, s in enumerate(captured["styles"]):
        k = len(CFG.styles[g])
        assert np.isclose(s.sum(), 1.0) and (s > 0).sum() == k
    assert captured["bars"] == 32 and captured["seed"] == 0


def test_generate_auto_meshes_on_multichip(captured):
    """On a multi-device host the stock CLI hands the sampler a data mesh
    (this test env is the 8-device virtual CPU mesh)."""
    import jax
    cli.generate_main([])
    if len(jax.devices()) > 1:
        assert captured["mesh"] is not None
        assert captured["mesh"].devices.size == len(jax.devices())
    else:
        assert captured["mesh"] is None


def test_generate_styles_flag_means_mean_of_one_hots(captured):
    cli.generate_main(["--styles", "0", "3", "--bars", "2", "--seed", "7"])
    (s,) = captured["styles"]                     # ref: generate.py:146-148
    assert np.isclose(s[0], 0.5) and np.isclose(s[3], 0.5)
    assert np.isclose(s.sum(), 1.0)
    assert captured["bars"] == 2 and captured["seed"] == 7


def test_generate_sweep_interpolates_two_styles(captured):
    cli.generate_main(["--sweep", "0", "5", "4", "--temperature", "0.9"])
    styles = captured["styles"]
    assert len(styles) == 4
    ws = np.linspace(0.0, 1.0, 4)
    for w, s in zip(ws, styles):
        assert np.isclose(s[0], 1 - w) and np.isclose(s[5], w)
        assert np.isclose(s.sum(), 1.0)
    assert captured["temp"] == 0.9
