"""TensorBoard event-file writer tests: TFRecord framing, masked CRC32C, and
protobuf-level decode of the scalar events (no tensorflow available here, so
the test parses the wire format directly)."""

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
