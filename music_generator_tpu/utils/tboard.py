"""Minimal TensorBoard event-file writer (scalars), dependency-free.

The reference logs scalars to TensorBoard via Keras (ref: train.py:25).  This
environment has no tensorflow/tensorboard package, so this module hand-rolls
the two formats involved — the TFRecord framing (length + masked CRC32C) and
the tiny subset of the `Event`/`Summary` protobufs needed for scalar curves —
in ~100 lines of stdlib Python.  Files written here load in stock TensorBoard.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional


# --- CRC32C (Castagnoli), table-driven --------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- Tiny protobuf encoder ---------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_double(num: int, value: float) -> bytes:
    return _varint(num << 3 | 1) + struct.pack("<d", value)


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(value)


def _field_bytes(num: int, payload: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _field_float(num: int, value: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", value)


def _scalar_event(step: int, tag: str, value: float,
                  wall_time: Optional[float] = None) -> bytes:
    summary_value = _field_bytes(1, tag.encode()) + _field_float(2, value)
    summary = _field_bytes(1, summary_value)
    return (_field_double(1, wall_time or time.time())
            + _field_varint(2, step)
            + _field_bytes(5, summary))


def _version_event() -> bytes:
    return (_field_double(1, time.time())
            + _field_bytes(3, b"brain.Event:2"))


class SummaryWriter:
    """Append-only scalar event writer; one file per run directory."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}")
        self._f = open(os.path.join(log_dir, fname), "ab")
        self._write_record(_version_event())

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(_scalar_event(step, tag, float(value)))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
