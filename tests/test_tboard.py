"""TensorBoard event-file writer tests: TFRecord framing, masked CRC32C, and
protobuf-level decode of the scalar events via a hand-rolled wire parser,
plus (when tensorflow is importable — it is in this image, CPU-only) a
round-trip through TF's REAL event/summary protos as the external oracle
for the field numbers."""

import glob
import io
import os
import struct

import numpy as np

from music_generator_tpu.utils.tboard import SummaryWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors.
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_records(path):
    data = open(path, "rb").read()
    buf = io.BytesIO(data)
    records = []
    while True:
        header = buf.read(8)
        if len(header) < 8:
            break
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", buf.read(4))
        assert hcrc == _masked_crc(header), "header CRC mismatch"
        payload = buf.read(length)
        (pcrc,) = struct.unpack("<I", buf.read(4))
        assert pcrc == _masked_crc(payload), "payload CRC mismatch"
        records.append(payload)
    return records


def _parse_scalar(payload):
    """Minimal Event proto walk: returns (step, tag, value) or None."""
    buf = io.BytesIO(payload)

    def varint():
        v, shift = 0, 0
        while True:
            b = buf.read(1)[0]
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    step, summary = None, None
    while buf.tell() < len(payload):
        key = varint()
        field, wire = key >> 3, key & 7
        if wire == 1:
            buf.read(8)
        elif wire == 0:
            val = varint()
            if field == 2:
                step = val
        elif wire == 2:
            length = varint()
            data = buf.read(length)
            if field == 5:
                summary = data
        elif wire == 5:
            buf.read(4)
    if summary is None:
        return None
    # Summary → Value → (tag, simple_value)
    sbuf = io.BytesIO(summary)
    key = int.from_bytes(sbuf.read(1), "little")
    assert key >> 3 == 1 and key & 7 == 2
    vlen_b = sbuf.read(1)[0]
    vdata = sbuf.read(vlen_b)
    vbuf = io.BytesIO(vdata)
    tag, value = None, None
    while vbuf.tell() < len(vdata):
        key = vbuf.read(1)[0]
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln = vbuf.read(1)[0]
            data = vbuf.read(ln)
            if field == 1:
                tag = data.decode()
        elif wire == 5:
            raw = vbuf.read(4)
            if field == 2:
                value = struct.unpack("<f", raw)[0]
    return step, tag, value


def test_event_file_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar("train/loss", 0.75, step=1)
    w.scalar("train/loss", 0.5, step=2)
    w.scalar("epoch/epoch_loss", 0.25, step=1)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    # Record 0 is the file_version event, then our three scalars.
    assert len(records) == 4
    scalars = [_parse_scalar(r) for r in records[1:]]
    assert scalars[0] == (1, "train/loss", 0.75)
    assert scalars[1] == (2, "train/loss", 0.5)
    assert scalars[2][1] == "epoch/epoch_loss"
    np.testing.assert_allclose(scalars[2][2], 0.25)


def _parse_value_fields(payload):
    """Walk Event → Summary → first Value, returning {field: bytes/scalar}."""
    buf = io.BytesIO(payload)

    def varint(b):
        v, shift = 0, 0
        while True:
            byte = b.read(1)[0]
            v |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return v
            shift += 7

    summary = None
    while buf.tell() < len(payload):
        key = varint(buf)
        field, wire = key >> 3, key & 7
        if wire == 1:
            buf.read(8)
        elif wire == 0:
            varint(buf)
        elif wire == 5:
            buf.read(4)
        elif wire == 2:
            data = buf.read(varint(buf))
            if field == 5:
                summary = data
    if summary is None:
        return None
    sbuf = io.BytesIO(summary)
    key = varint(sbuf)
    assert key >> 3 == 1 and key & 7 == 2
    vdata = sbuf.read(varint(sbuf))
    vbuf = io.BytesIO(vdata)
    out = {}
    while vbuf.tell() < len(vdata):
        key = varint(vbuf)
        field, wire = key >> 3, key & 7
        if wire == 2:
            out[field] = vbuf.read(varint(vbuf))
        elif wire == 5:
            out[field] = struct.unpack("<f", vbuf.read(4))[0]
        elif wire == 1:
            out[field] = struct.unpack("<d", vbuf.read(8))[0]
        elif wire == 0:
            out[field] = varint(vbuf)
    return out


def _parse_histo(histo_bytes):
    """HistogramProto → dict with min/max/num/sum/sum_squares/limits/buckets."""
    buf = io.BytesIO(histo_bytes)

    def varint():
        v, shift = 0, 0
        while True:
            b = buf.read(1)[0]
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    names = {1: "min", 2: "max", 3: "num", 4: "sum", 5: "sum_squares"}
    out = {"limits": [], "buckets": []}
    while buf.tell() < len(histo_bytes):
        key = varint()
        field, wire = key >> 3, key & 7
        if wire == 1:
            out[names[field]] = struct.unpack("<d", buf.read(8))[0]
        elif wire == 2:
            data = buf.read(varint())
            vals = [struct.unpack("<d", data[i:i + 8])[0]
                    for i in range(0, len(data), 8)]
            out["limits" if field == 6 else "buckets"] = vals
    return out


def test_histogram_event_wire_format(tmp_path):
    """Histogram records decode to a well-formed HistogramProto: correct
    moments, counts summing to num, monotonically increasing bucket limits
    (the reference's histogram_freq=1 observability, ref: train.py:25)."""
    vals = np.concatenate([np.linspace(-2.0, 3.0, 101), [0.5] * 9])
    w = SummaryWriter(str(tmp_path))
    w.histogram("params/test/kernel", vals, step=4)
    w.histogram("empty", np.array([]), step=4)
    w.histogram("constant", np.full(7, 1.25), step=4)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(files[0])
    assert len(records) == 4        # version + 3 histograms

    v = _parse_value_fields(records[1])
    assert v[1] == b"params/test/kernel"
    h = _parse_histo(v[5])   # Summary.Value field 5 = histo
    np.testing.assert_allclose(h["min"], vals.min())
    np.testing.assert_allclose(h["max"], vals.max())
    np.testing.assert_allclose(h["num"], len(vals))
    np.testing.assert_allclose(h["sum"], vals.sum())
    np.testing.assert_allclose(h["sum_squares"], np.square(vals).sum())
    np.testing.assert_allclose(sum(h["buckets"]), len(vals))
    assert all(a < b for a, b in zip(h["limits"], h["limits"][1:]))

    h_empty = _parse_histo(_parse_value_fields(records[2])[5])
    assert h_empty["num"] == 0


def test_histogram_survives_nonfinite(tmp_path):
    """Diverged params (NaN/inf) must log as a degenerate histogram, not
    crash fit() at epoch end (np.histogram raises on a NaN range)."""
    w = SummaryWriter(str(tmp_path))
    w.histogram("nan", np.array([np.nan, np.inf, -np.inf]), step=1)
    w.histogram("mixed", np.array([1.0, np.nan, 2.0]), step=1)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(files[0])
    h_nan = _parse_histo(_parse_value_fields(records[1])[5])
    assert h_nan["num"] == 0
    h_mixed = _parse_histo(_parse_value_fields(records[2])[5])
    assert h_mixed["num"] == 2
    np.testing.assert_allclose(h_mixed["sum"], 3.0)


def test_histogram_constant_values(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.histogram("constant", np.full(7, 1.25), step=4)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(files[0])
    h_const = _parse_histo(_parse_value_fields(records[1])[5])
    assert h_const["num"] == 7
    np.testing.assert_allclose(h_const["min"], 1.25)
    np.testing.assert_allclose(sum(h_const["buckets"]), 7)


def test_trainer_writes_param_histograms(tmp_path):
    """Trainer.fit with tensorboard on emits one histogram per param leaf
    per epoch (histogram_freq=1 parity with ref: train.py:25)."""
    import jax
    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.dataset import Dataset
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.parallel.mesh import make_mesh
    from music_generator_tpu.training.trainer import TrainConfig, Trainer

    cfg = test_config(batch_size=2, out_dir=str(tmp_path / "out"))
    model = DeepJ(cfg)
    T, N = cfg.seq_len, cfg.num_notes
    ds = Dataset(np.zeros((2, T, N, 3), np.float32),
                 np.zeros((2, T, N, 3), np.float32),
                 np.zeros((2, T, cfg.notes_per_bar), np.float32),
                 np.zeros((2, T, cfg.num_styles), np.float32))
    trainer = Trainer(model, TrainConfig(epochs=1, checkpoint=False),
                      mesh=make_mesh(jax.devices()[:1]))
    trainer.fit(ds)

    files = glob.glob(str(tmp_path / "out" / "logs" / "events.out.tfevents.*"))
    assert len(files) == 1
    histo_tags = []
    for rec in _read_records(files[0])[1:]:
        v = _parse_value_fields(rec)
        if v and 5 in v:                   # Summary.Value field 5 = histo
            histo_tags.append(v[1].decode())
            h = _parse_histo(v[5])
            assert h["num"] > 0
    n_leaves = len(jax.tree.leaves(trainer.state.params))
    assert len(histo_tags) == n_leaves
    assert all(t.startswith("params") for t in histo_tags)
    assert len(set(histo_tags)) == n_leaves     # distinct per-leaf tags


def test_wire_format_parses_with_real_tensorflow(tmp_path):
    """External oracle: TF's own Event/Summary protos must decode the
    writer's records with the scalar in simple_value and the histogram in
    Summary.Value.histo (field 5 — a hand-rolled parser sharing a wrong
    field constant with the writer cannot catch that class of bug; this
    one did exist: histograms were written to field 4 = image)."""
    import pytest
    tf = pytest.importorskip("tensorflow")
    from tensorflow.core.util import event_pb2

    vals = np.linspace(-2.0, 3.0, 50)
    w = SummaryWriter(str(tmp_path))
    w.scalar("loss", 0.5, step=3)
    w.histogram("params/kernel", vals, step=4)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(files[0])
    events = [event_pb2.Event.FromString(r) for r in records]
    assert events[0].file_version == "brain.Event:2"

    sv = events[1].summary.value[0]
    assert sv.tag == "loss"
    assert events[1].step == 3
    np.testing.assert_allclose(sv.simple_value, 0.5, rtol=1e-6)

    hv = events[2].summary.value[0]
    assert hv.tag == "params/kernel"
    assert hv.WhichOneof("value") == "histo"
    h = hv.histo
    np.testing.assert_allclose(h.min, vals.min())
    np.testing.assert_allclose(h.max, vals.max())
    np.testing.assert_allclose(h.num, len(vals))
    np.testing.assert_allclose(h.sum, vals.sum())
    np.testing.assert_allclose(sum(h.bucket), len(vals))
