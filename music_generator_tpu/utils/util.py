"""Shared helpers (ref: util.py)."""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def one_hot(i: int, nb_classes: int) -> np.ndarray:
    """One-hot float vector (ref: util.py:8-11)."""
    arr = np.zeros((nb_classes,))
    arr[i] = 1
    return arr


def get_all_files(paths: Sequence[str]) -> List[str]:
    """Recursively collect .mid files under each path, in deterministic
    (sorted) order — the reference's os.walk order is filesystem-dependent
    (ref: util.py:25-33, and the ordering TODO at dataset.py:50)."""
    potential_files = []
    for path in paths:
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            for f in sorted(files):
                fname = os.path.join(root, f)
                if os.path.isfile(fname) and fname.endswith(".mid"):
                    potential_files.append(fname)
    return potential_files
