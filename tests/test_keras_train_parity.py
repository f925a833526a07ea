"""Training-trajectory parity vs real TF/Keras (tools/keras_train_parity.py).

The full evidence run (30 deterministic steps + 40-step stochastic control
on the real corpus) is the committed artifact
`artifacts/keras_train_parity_r4/REPORT.json`; CI re-runs the deterministic
phase small — 6 Keras-2 Nadam steps of the transcribed reference graph
under real TF autodiff vs the production JAX train step, from identical
init on identical real-corpus windows — and holds the per-step losses to
sub-percent agreement.  This is the external check that the two frameworks
perform the SAME TRAINING RUN, not merely the same forward/gradient
(tests/test_keras_oracle.py covers those single-step claims).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")


def test_deterministic_trajectory_tracks_real_keras(tmp_path):
    from music_generator_tpu.config import default_config
    from tools.keras_train_parity import (
        real_corpus_batches,
        run_jax,
        run_keras,
    )

    steps = 6
    cfg = default_config().replace(
        bars_per_seq=1, batch_size=2,
        lstm_kernel="xla", compute_dtype="float32",
        transpose_augment=0, fast_dropout_rng=False)
    batches = real_corpus_batches(cfg, steps)

    jax_losses, jax_params, init_h5 = run_jax(cfg, batches, steps,
                                              workdir=str(tmp_path))
    keras_losses, tf_vars = run_keras(cfg, init_h5, batches, steps)

    assert len(jax_losses) == len(keras_losses) == steps
    for k, j in zip(keras_losses, jax_losses):
        assert abs(k - j) / abs(k) < 5e-3, (keras_losses, jax_losses)
    # Both are training (loss moves down from the random-init plateau).
    assert keras_losses[-1] < keras_losses[0]
    assert jax_losses[-1] < jax_losses[0]

    from tools.keras_train_parity import compare_params
    worst, name = compare_params(tf_vars, jax_params)
    assert worst < 5e-3, (worst, name)
