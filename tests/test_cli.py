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

        def generate(self, styles, num_bars, seed, prime=None):
            from music_generator_tpu.generation.sampler import (
                GenerationResult)
            rec["styles"] = [np.asarray(s) for s in styles]
            rec["bars"] = num_bars
            rec["seed"] = seed
            rec["prime"] = None if prime is None else np.asarray(prime)
            notes = np.zeros((len(styles), num_bars * CFG.notes_per_bar,
                              CFG.num_notes, 3), np.float32)
            return GenerationResult(notes=notes, styles=np.stack(styles))

    def fake_write(name, result, cfg):
        rec.setdefault("out", name)
        rec["result"] = result

    monkeypatch.setattr(cli, "Sampler", FakeSampler)
    monkeypatch.setattr(cli, "build_or_load", lambda model: ("params", True))
    monkeypatch.setattr(cli, "write_file", fake_write)
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


def _write_tiny_midi(path):
    """A 2-bar clamped roll round-tripped to a real .mid on disk."""
    from music_generator_tpu.data.dataset import unclamp_midi
    from music_generator_tpu.midi.codec import midi_encode
    from music_generator_tpu.midi.io import write_midifile
    roll = np.zeros((2 * CFG.notes_per_bar, CFG.num_notes, 3), np.float32)
    roll[::4, 10, 0] = 1.0
    roll[::4, 10, 2] = 0.5
    write_midifile(str(path), midi_encode(unclamp_midi(roll, CFG), config=CFG))


def test_generate_prime_feeds_clamped_roll_and_writes_full_piece(
        captured, tmp_path, monkeypatch):
    monkeypatch.setattr(cli, "default_config",
                        lambda: CFG.replace(out_dir=str(tmp_path)))
    p = tmp_path / "seed.mid"
    _write_tiny_midi(p)
    cli.generate_main(["--prime", str(p), "--prime-bars", "1",
                       "--bars", "2", "--styles", "0"])
    assert captured["prime"].shape == (CFG.notes_per_bar, CFG.num_notes, 3)
    # Default output = prime + continuation concatenated.
    assert captured["result"].notes.shape[1] == 3 * CFG.notes_per_bar


def test_generate_prime_continuation_only(captured, tmp_path, monkeypatch):
    monkeypatch.setattr(cli, "default_config",
                        lambda: CFG.replace(out_dir=str(tmp_path)))
    p = tmp_path / "seed.mid"
    _write_tiny_midi(p)
    cli.generate_main(["--prime", str(p), "--bars", "2", "--styles", "0",
                       "--continuation-only"])
    assert captured["result"].notes.shape[1] == 2 * CFG.notes_per_bar


def test_generate_main_initializes_distributed(captured, monkeypatch):
    """generate_main calls maybe_init_distributed() before any backend
    touch — without it a pod host silently generates single-process on
    its local chips (review r5; the sampler's process_count>1 path and
    serving's lead/follow branch both depend on the init having fired)."""
    calls = []
    monkeypatch.setattr(cli, "maybe_init_distributed",
                        lambda: calls.append(True))
    cli.generate_main(["--bars", "1", "--styles", "0"])
    assert calls == [True]


def test_generate_sweep_interpolates_two_styles(captured):
    cli.generate_main(["--sweep", "0", "5", "4", "--temperature", "0.9"])
    styles = captured["styles"]
    assert len(styles) == 4
    ws = np.linspace(0.0, 1.0, 4)
    for w, s in zip(ws, styles):
        assert np.isclose(s[0], 1 - w) and np.isclose(s[5], w)
        assert np.isclose(s.sum(), 1.0)
    assert captured["temp"] == 0.9
