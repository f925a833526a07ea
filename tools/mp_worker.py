#!/usr/bin/env python
"""Multi-process data-parallel worker: one JAX process of a 2-process CPU
cluster (4 virtual devices each → 8 global).  Spawned by
tests/test_multiprocess.py (and usable standalone) to exercise the REAL
multi-host code paths — jax.distributed.initialize, per-process
Dataset.shard, shard_batch's make_array_from_process_local_data branch, and
the cross-process gradient all-reduce — which single-process tests cannot.

Usage: mp_worker.py <process_id> <num_processes> <port> <out_json> [mode]
mode "step" (default): one train step on a hand-sharded batch; process 0
writes {"loss": ..., "param_sum": ...} to out_json.
mode "fit": the FULL Trainer.fit flow over an UNEVEN corpus (17 windows
over 2 hosts) — the desync scenario: Dataset.shard must pad shards to equal
length so both hosts run the same global collectives per epoch.  EVERY
process writes {out_json}.{pid} with its loss history + param_sum, so the
test can assert the hosts stayed in lockstep.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_fit(pid: int, nproc: int, out: str) -> None:
    import jax
    import numpy as np

    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.dataset import Dataset
    from music_generator_tpu.data.synth import random_batch
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.training.trainer import TrainConfig, Trainer

    # 17 global windows over 2 hosts: pre-padding host 0 held 9 rows and
    # host 1 held 8, so host 0 ran one more (global, collective) step per
    # epoch and the cluster deadlocked.  batch_size 4 -> each host feeds 4
    # local rows/step (global batch 8 over 8 devices), 3 steps/epoch.
    cfg = test_config(batch_size=4,
                      out_dir=os.path.join(os.path.dirname(os.path.abspath(out))
                                           or ".", f"out_mp_{pid}"))
    model = DeepJ(cfg)
    global_ds = Dataset(*random_batch(cfg, batch_size=17))
    local = global_ds.shard(pid, nproc)
    assert len(local) == -(-17 // nproc), len(local)

    trainer = Trainer(model, TrainConfig(epochs=2, checkpoint=False,
                                         tensorboard=False))
    history = trainer.fit(local)
    param_sum = float(sum(float(np.abs(x).sum())
                          for x in jax.tree.leaves(trainer.state.params)))
    # Cross-process evaluate: a global collective over both hosts' shards —
    # every host must compute the identical global mean, and with 17
    # windows over 2 hosts the wrap-padded duplicate row must be weighted
    # out (shard_validity): the mean divides by 17, not 18.
    eval_loss = trainer.evaluate(local)["loss"]
    # Exact oracle: per-window loss over the GLOBAL corpus, computed
    # locally (replicated params are fully addressable on every host).
    from music_generator_tpu.models.deepj import per_sample_loss
    params_np = jax.tree.map(np.asarray, trainer.state.params)
    preds = model.forward(params_np, global_ds.notes, global_ds.targets,
                          global_ds.beats, global_ds.styles,
                          rng=None, train=False)
    eval_oracle = float(np.mean(np.asarray(
        per_sample_loss(global_ds.targets, preds)["loss"])))
    with open(f"{out}.{pid}", "w") as f:
        json.dump({"loss": history["loss"],
                   "steps_per_epoch": history["steps_per_epoch"],
                   "eval_loss": eval_loss,
                   "eval_oracle": eval_oracle,
                   "param_sum": param_sum}, f)


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    if mode == "fit":
        run_fit(pid, nproc, out)
        jax.distributed.shutdown()
        return

    import numpy as np

    from music_generator_tpu.config import test_config
    from music_generator_tpu.data.dataset import Dataset
    from music_generator_tpu.data.synth import random_batch
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
    B = cfg.batch_size
    notes, targets, beats, styles = random_batch(cfg)
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
