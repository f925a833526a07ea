#!/usr/bin/env python
"""Multi-process data-parallel worker: one JAX process of a 2-process CPU
cluster (4 virtual devices each → 8 global).  Spawned by
tests/test_multiprocess.py (and usable standalone) to exercise the REAL
multi-host code paths — jax.distributed.initialize, per-process
Dataset.shard, shard_batch's make_array_from_process_local_data branch, and
the cross-process gradient all-reduce — which single-process tests cannot.

Usage: mp_worker.py <process_id> <num_processes> <port> <out_json>
Process 0 writes {"loss": ..., "param_sum": ...} to out_json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.dataset import Dataset
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.parallel.mesh import make_mesh, shard_batch
    from music_generator_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = test_config(batch_size=8)        # global batch over 8 devices
    model = DeepJ(cfg)

    # Identical global dataset on every process (seeded), then the per-host
    # shard — the documented multi-host flow (Dataset.shard -> local rows).
    rng = np.random.default_rng(0)
    B, T, N = cfg.batch_size, cfg.seq_len, cfg.num_notes
    notes = (rng.random((B, T, N, 3)) < 0.1).astype(np.float32)
    targets = (rng.random((B, T, N, 3)) < 0.1).astype(np.float32)
    beats = np.zeros((B, T, cfg.notes_per_bar), np.float32)
    beats[:, np.arange(T), np.arange(T) % cfg.notes_per_bar] = 1
    styles = np.zeros((B, T, cfg.num_styles), np.float32)
    styles[..., 0] = 1
    global_ds = Dataset(notes, targets, beats, styles)
    # Contiguous per-process split: P("data") lays out the global batch in
    # device order, so process p owns rows [p*4, (p+1)*4).
    lo, hi = pid * 4, (pid + 1) * 4
    local = (notes[lo:hi], targets[lo:hi], beats[lo:hi], styles[lo:hi])

    # Interleaved Dataset.shard is exercised too (shape contract).
    shard = global_ds.shard(pid, nproc)
    assert len(shard) == B // nproc

    mesh = make_mesh()                      # all 8 global devices
    state, opt = create_train_state(model, seed=0)
    step = make_train_step(model, opt, mesh)
    batch = shard_batch(mesh, local)        # multi-process branch
    assert len(batch[0].sharding.device_set) == 8
    assert batch[0].shape[0] == B           # assembled GLOBAL batch

    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    param_sum = float(sum(float(np.abs(x).sum())
                          for x in jax.tree.leaves(state.params)))
    if pid == 0:
        with open(out, "w") as f:
            json.dump({"loss": loss, "param_sum": param_sum}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
