"""Device mesh and sharding helpers.

The reference is single-process, single-GPU (SURVEY.md §2: no tf.distribute,
no NCCL/MPI anywhere).  Data parallelism is therefore a new, first-class
component here: a 1-D `data` mesh axis over all chips; batches are sharded on
their leading dimension, parameters and optimizer state are replicated, and
the gradient all-reduce materializes automatically as an XLA collective over
ICI when `jit` partitions the train step.

Multi-host: call `jax.distributed.initialize()` before building the mesh
(training.trainer does this when run under multi-host launch), feed each host
its own shard of the dataset (data.Dataset.shard), and the same code runs
unchanged — `jax.make_array_from_process_local_data` assembles the global
batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def auto_mesh(axis_name: str = "data") -> Optional[Mesh]:
    """A data mesh over every chip in the cluster when there is more than
    one, else None — the user-facing default for generation surfaces
    (generate CLI, serving): BASELINE config 4's 64 parallel samples shard
    over a v5e-8 from the stock CLI with no flags.

    Multi-process (r5, VERDICT r4 #4): the mesh is GLOBAL — every host
    must run the same generate() calls with the same arguments (the SPMD
    convention; the CLI satisfies it naturally when each pod host runs the
    same command), the streams shard across hosts, and each host reads
    back the full replicated result (Sampler._mp_fns).  Bytes equal the
    single-process run per deviation #10
    (tests/test_multiprocess.py::test_two_process_generation...)."""
    if len(jax.devices()) > 1:
        return make_mesh(axis_name=axis_name)
    return None


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Tuple, axis_name: str = "data") -> Tuple:
    """Place host arrays onto the mesh, sharded along the batch dim.

    Works in both single-process (device_put with a sharding) and
    multi-process mode (each process contributes its local shard).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return tuple(
            jax.make_array_from_process_local_data(sharding, np.asarray(x))
            for x in batch)
    return tuple(jax.device_put(x, sharding) for x in batch)
