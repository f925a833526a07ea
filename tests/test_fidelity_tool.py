"""CI coverage for tools/check_fidelity.py's plumbing — the npz
params round-trip and the byte comparison — so the certification tool
(the fidelity release workflow, docs/FIDELITY.md) can't silently rot.
The TPU-vs-CPU generation matrix itself runs on hardware, not here."""

import os
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_fidelity import (  # noqa: E402
    _params_from_npz,
    _params_to_npz,
    compare_dirs,
)


def test_params_npz_roundtrip_is_exact(tmp_path):
    from music_generator_tpu.config import test_config
    from music_generator_tpu.models.deepj import DeepJ, init_params

    cfg = test_config()
    params = init_params(jax.random.key(3), cfg)
    path = str(tmp_path / "params.npz")
    _params_to_npz(params, path)
    restored = _params_from_npz(DeepJ(cfg), path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compare_dirs_detects_byte_differences(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for d in (a, b):
        (d / "same.mid").write_bytes(b"\x00\x01\x02")
    (a / "diff.mid").write_bytes(b"\x00\x01\x02\x03")
    (b / "diff.mid").write_bytes(b"\x00\x01\x02\x04")   # one byte off
    r = compare_dirs(str(a), str(b))
    assert r["files"] == 2
    assert r["mismatches"] == ["diff.mid"]
    assert not r["identical"]

    (a / "diff.mid").write_bytes(b"\x00\x01\x02\x04")
    r = compare_dirs(str(a), str(b))
    assert r["identical"] and r["mismatches"] == []
    assert r["event_identical"] and r["event_mismatches"] == []


def test_compare_dirs_event_level_column(tmp_path):
    """Certificates carry event-level identity as a first-class column
    (VERDICT r4): a volume-only byte difference (the r4 flagship's knife
    edge shape) reports event_identical=True; a note-content difference
    reports False — no manual DIVERGENCE pass needed to tell them apart."""
    from music_generator_tpu.config import default_config
    from music_generator_tpu.midi.codec import midi_encode
    from music_generator_tpu.midi.io import write_midifile

    cfg = default_config()
    roll = np.zeros((8, 128, 3), np.float32)
    roll[2:6, 60, 0] = 1.0
    roll[2:6, 60, 2] = 0.5
    roll_vol = roll.copy()
    roll_vol[2:6, 60, 2] = 0.52          # same notes, one velocity off
    roll_note = roll.copy()
    roll_note[2:6, 62, 0] = 1.0          # an extra note
    roll_note[2:6, 62, 2] = 0.5

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for d, rx, ry in ((a, roll, roll), (b, roll_vol, roll_note)):
        write_midifile(str(d / "vol.mid"), midi_encode(rx, config=cfg))
        write_midifile(str(d / "note.mid"), midi_encode(ry, config=cfg))
    r = compare_dirs(str(a), str(b))
    assert r["mismatches"] == ["note.mid", "vol.mid"]
    assert r["event_mismatches"] == ["note.mid"]
    assert not r["identical"] and not r["event_identical"]


def test_preseeded_params_cannot_override_explicit_flags(tmp_path):
    """A stale pre-seeded <out>/params.npz must not silently win over an
    explicit --random-init or --params (it would mislabel the published
    report's params_source) — both are rejected before any generation."""
    import pytest
    from tools.check_fidelity import main as fid_main

    out = tmp_path / "fid"
    out.mkdir()
    (out / "params.npz").write_bytes(b"stale")
    with pytest.raises(SystemExit, match="random-init"):
        fid_main(["--out", str(out), "--random-init"])
    with pytest.raises(SystemExit, match="params"):
        fid_main(["--out", str(out), "--params", str(tmp_path / "x.npz")])


def test_probe_rejects_unsupported_batch_geometry():
    """tools/tpu_probe_ceiling validates the cost-model geometry BEFORE
    burning on-chip compiles: batch >= 256 leaves the tiling unchanged
    (fit undefined); batch 40 gives the two stacks different tile rows."""
    import pytest
    from tools.tpu_probe_ceiling import main as probe_main

    with pytest.raises(SystemExit, match="does not change the tiling"):
        probe_main(["--batch", "256", "--steps", "1"])
    with pytest.raises(SystemExit, match="unsupported --batch geometry"):
        probe_main(["--batch", "40", "--steps", "1"])
