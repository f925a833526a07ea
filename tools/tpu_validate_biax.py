"""On-chip validation of the v3 fused biaxial kernels (the production
training path, ops/pallas_biax.py) against the unfused XLA model.

tests/test_pallas_biax.py proves equivalence in Pallas INTERPRET mode on
CPU; this tool proves the COMPILED Mosaic lowering on the real TPU —
the class of bug interpret mode cannot catch (round-1 found several:
pathological concat lowerings, bf16 sigmoid lowering failures).

Checks, at flagship default_config dims, batch 16:
  1. dropout=0 forward loss: fused bf16 vs unfused-XLA bf16 (identical
     math modulo accumulation order — expect ~1e-3 relative in bf16) and
     vs unfused-XLA f32 (the ground truth).
  2. dropout=0 full-model gradients: cosine similarity and relative
     max-norm of every param leaf, fused vs unfused bf16.
  3. One real train step on each path from identical state: loss delta.

Run on the TPU box:  python tools/tpu_validate_biax.py
With --gates hard_sigmoid, the same checks run on the Keras-2 hard-sigmoid
gate branch (deviation #12, r5: fused on every kernel) — the compiled-Mosaic
proof behind tests/test_hard_gates.py's interpret-mode pins.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gates", default="sigmoid",
                        choices=["sigmoid", "hard_sigmoid"],
                        help="LSTM recurrent (gate) activation to validate")
    args = parser.parse_args()

    from music_generator_tpu.utils.compile_cache import enable
    enable()

    import jax
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.synth import random_batch
    from music_generator_tpu.models.deepj import DeepJ, init_params

    print("backend:", jax.default_backend())
    print("gates:", args.gates)
    base = default_config().replace(batch_size=16, input_dropout=0.0,
                                    dropout=0.0,
                                    lstm_recurrent_activation=args.gates)
    variants = {
        "fused-bf16": base.replace(lstm_kernel="pallas"),
        "xla-bf16": base.replace(lstm_kernel="xla"),
        "xla-f32": base.replace(lstm_kernel="xla", compute_dtype="float32"),
    }
    params = init_params(jax.random.key(0), base)
    batch = random_batch(base, rolled_targets=True)
    rng = jax.random.key(1)

    # --- 1+2. loss and grads per variant ---------------------------------
    results = {}
    for name, cfg in variants.items():
        model = DeepJ(cfg)

        @jax.jit
        def loss_and_grad(params):
            def f(p):
                loss, _ = model.loss(p, batch, rng=rng, train=True)
                return loss
            return jax.value_and_grad(f)(params)

        loss, grads = loss_and_grad(params)
        results[name] = (float(loss), grads)
        print(f"{name}: loss={float(loss):.6f}", flush=True)

    ref_loss = results["xla-f32"][0]
    for name in ("fused-bf16", "xla-bf16"):
        d = abs(results[name][0] - ref_loss) / ref_loss
        print(f"{name} vs xla-f32 loss rel-diff: {d:.3e}")
        assert d < 5e-2, (name, results[name][0], ref_loss)
    d = abs(results["fused-bf16"][0] - results["xla-bf16"][0]) \
        / results["xla-bf16"][0]
    print(f"fused-bf16 vs xla-bf16 loss rel-diff: {d:.3e}")
    assert d < 2e-2, d

    ga = jax.tree.leaves(results["fused-bf16"][1])
    gb = jax.tree.leaves(results["xla-bf16"][1])
    worst = (1.0, None)
    worst_mag = (0.0, None)
    for path_leaf, a, b in zip(
            jax.tree_util.tree_flatten_with_path(results["fused-bf16"][1])[0],
            ga, gb):
        name = jax.tree_util.keystr(path_leaf[0])
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0 or nb == 0.0:
            # A zero gradient only matches a zero gradient — a fused leaf
            # silently zeroed by a lowering bug must NOT score cos=1.
            cos = 1.0 if (na == 0.0 and nb == 0.0) else 0.0
        else:
            cos = float(a @ b / (na * nb))
        if cos < worst[0]:
            worst = (cos, name)
        # Relative error in magnitude: catches right-direction/wrong-scale
        # bugs (e.g. a dropped factor in the fused backward).
        mag = float(np.linalg.norm(a - b) / nb) if nb > 0 else \
            (0.0 if na == 0.0 else np.inf)
        if mag > worst_mag[0]:
            worst_mag = (mag, name)
    print(f"grad cosine similarity (worst leaf): {worst[0]:.5f} "
          f"at {worst[1]}")
    print(f"grad relative error ||a-b||/||b|| (worst leaf): "
          f"{worst_mag[0]:.3e} at {worst_mag[1]}")
    assert worst[0] > 0.98, worst
    assert worst_mag[0] < 0.15, worst_mag

    # --- 3. one real train step each -------------------------------------
    from music_generator_tpu.parallel.mesh import make_mesh, shard_batch
    from music_generator_tpu.parallel.train_step import (
        create_train_state, make_train_step)

    mesh = make_mesh(jax.devices()[:1])
    losses = {}
    for name in ("fused-bf16", "xla-bf16"):
        model = DeepJ(variants[name])
        state, opt = create_train_state(model, seed=0)
        step = make_train_step(model, opt, mesh)
        state, m1 = step(state, shard_batch(mesh, batch))
        state, m2 = step(state, shard_batch(mesh, batch))
        losses[name] = (float(m1["loss"]), float(m2["loss"]))
        print(f"{name}: step losses {losses[name][0]:.5f} -> "
              f"{losses[name][1]:.5f}", flush=True)
    d = abs(losses["fused-bf16"][1] - losses["xla-bf16"][1])
    print(f"post-update loss abs-diff: {d:.2e}")
    assert losses["fused-bf16"][1] < losses["fused-bf16"][0], \
        "fused step did not reduce loss"
    assert d < 5e-2, d
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
