"""ctypes bindings for the native C++ MIDI decoder (native/midi_codec.cc).

The native decoder is the fast path for corpus loading: it parses and decodes
outside the GIL, so the data pipeline's thread pool achieves true parallel
decode.  Semantics are bit-identical to the Python codec (differentially
tested in tests/test_native_codec.py); the Python path remains the reference
implementation and the fallback when the library hasn't been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    candidates = [
        os.environ.get("DEEPJ_MIDI_LIB", ""),
        os.path.join(repo, "native", "libdeepj_midi.so"),
        os.path.join(here, "libdeepj_midi.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dj_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dj_decode_file.restype = ctypes.c_int
        lib.dj_decode_buffer.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dj_decode_buffer.restype = ctypes.c_int
        lib.dj_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.dj_abi_version.restype = ctypes.c_int
        if lib.dj_abi_version() != 1:
            return None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def native_decode_file(path: str, notes_per_beat: int = 4,
                       step: int = 0) -> np.ndarray:
    """Decode a .mid file to a [T, 128, 3] float64 roll via the C++ decoder.

    step=0 derives the step from the file's resolution (like midi_decode's
    default).  Raises RuntimeError on parse failure, ImportError if the
    library isn't built.
    """
    lib = _load()
    if lib is None:
        raise ImportError("libdeepj_midi.so not built (run: make -C native)")
    out = ctypes.POINTER(ctypes.c_double)()
    frames = ctypes.c_int64()
    rc = lib.dj_decode_file(path.encode(), notes_per_beat, step,
                            ctypes.byref(out), ctypes.byref(frames))
    if rc != 0:
        raise RuntimeError(f"native MIDI decode failed (code {rc}): {path}")
    try:
        n = frames.value
        if n == 0 or not out:
            return np.zeros((0, 128, 3))
        arr = np.ctypeslib.as_array(out, shape=(n, 128, 3)).copy()
    finally:
        if out:
            lib.dj_free(out)
    return arr


def native_decode_bytes(data: bytes, notes_per_beat: int = 4,
                        step: int = 0) -> np.ndarray:
    """Decode an in-memory .mid buffer (same contract as native_decode_file)."""
    lib = _load()
    if lib is None:
        raise ImportError("libdeepj_midi.so not built (run: make -C native)")
    out = ctypes.POINTER(ctypes.c_double)()
    frames = ctypes.c_int64()
    rc = lib.dj_decode_buffer(data, len(data), notes_per_beat, step,
                              ctypes.byref(out), ctypes.byref(frames))
    if rc != 0:
        raise RuntimeError(f"native MIDI decode failed (code {rc})")
    try:
        n = frames.value
        if n == 0 or not out:
            return np.zeros((0, 128, 3))
        arr = np.ctypeslib.as_array(out, shape=(n, 128, 3)).copy()
    finally:
        if out:
            lib.dj_free(out)
    return arr
