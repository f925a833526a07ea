"""Checkpointing: Orbax-backed save/restore with best-loss semantics.

Mirrors the reference's behavior (ref: train.py:23, util.py:13-23): a single
"best so far by training loss" checkpoint, silently absent on first run —
`build_or_load` restores if possible, else fresh-initializes.  Two deliberate
capability extensions over the reference: optimizer state and step counter
are checkpointed too (the reference saved weights only, so resume restarted
Nadam cold), and saves are atomic (Orbax).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from music_generator_tpu.models.deepj import DeepJ, Params, init_params


class CheckpointStore:
    """A single-slot best-checkpoint store at cfg.model_file."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, state, *, force: bool = True) -> None:
        self._ckptr.save(self.path, jax.tree.map(np.asarray, state),
                         force=force)
        self._ckptr.wait_until_finished()

    def restore(self, target):
        """Restore into the structure of `target` (a pytree of arrays)."""
        return self._ckptr.restore(
            self.path, target=jax.tree.map(np.asarray, target))

    def exists(self) -> bool:
        return os.path.isdir(self.path)


def build_or_load(model: DeepJ, seed: int = 0,
                  allow_load: bool = True,
                  path: Optional[str] = None) -> Tuple[Params, bool]:
    """Build params, then best-effort restore from the checkpoint file
    (ref: util.py:13-23 — including the swallow-errors-and-continue
    semantics, but we log what happened rather than a bare except).

    The checkpoint holds a full TrainState (params + optimizer state + step;
    training.trainer writes it), so the restore target is built in that
    shape and the params subtree extracted."""
    cfg = model.cfg
    # The reference prints model.summary() on every build (ref: util.py:16)
    # — shapes only, so eval_shape gives the table without materializing
    # weights; the fresh init happens only on the paths that return it
    # (the restore path previously ran init_params twice: once here and
    # once inside create_train_state — review r4 finding).
    from music_generator_tpu.utils import param_summary
    print(param_summary(
        jax.eval_shape(lambda: init_params(jax.random.key(seed), cfg))))
    if not allow_load:
        return init_params(jax.random.key(seed), cfg), False
    store = CheckpointStore(path or cfg.model_file)
    if not store.exists():
        print("Unable to load model from file.")
        return init_params(jax.random.key(seed), cfg), False
    try:
        from music_generator_tpu.parallel.train_step import create_train_state
        target, _ = create_train_state(model, seed)
        restored = store.restore(target)
        print("Loaded model from file.")
        return jax.tree.map(jax.numpy.asarray, restored.params), True
    except Exception as e:  # parity: never fail startup on a bad checkpoint
        print(f"Unable to load model from file. ({type(e).__name__}: {e})")
        return init_params(jax.random.key(seed), cfg), False
