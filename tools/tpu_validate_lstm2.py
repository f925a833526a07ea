"""TPU validation for the fused two-layer LSTM kernel.

Run on real TPU:  python tools/tpu_validate_lstm2.py

Checks:
  1. p=0 forward/backward match the unfused scans (compiled, not interpret).
  2. p>0: extract the kernel's own dropout masks with a sibling Pallas
     kernel, rebuild the computation in plain JAX with those masks, and
     compare BOTH outputs and gradients exactly.
  3. p>0: directional finite difference on a small-magnitude loss slice
     (a large-sum loss would drown the FD in f32 rounding noise).
  4. Timing vs the unfused pair.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan
from music_generator_tpu.ops import pallas_lstm2 as pk2


def extract_masks(T, B, H, seed, keep_prob, dtype):
    """Reproduce the kernel's per-(tile, step) masks as a [T, B, H] array."""
    BT, NB = pk2._stack_tiling(B, dtype)

    def kern(seed_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        m = pk2._mask(seed_ref[0, 0], b, t, (BT, H), keep_prob, dtype)
        out_ref[0] = m

    return pl.pallas_call(
        kern,
        grid=(NB, T),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, BT, H), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))


def main():
    T, B, D, H = 32, 512, 94, 256
    k = jax.random.split(jax.random.key(0), 4)
    p0 = lstm_init(k[0], D, H)
    p1 = lstm_init(k[1], H, H)
    xs = jax.random.normal(k[2], (T, B, D), jnp.float32)
    s1m = 0.1 * jax.random.normal(k[3], (T, B, H), jnp.float32)
    SEED = 7

    def fused(p0, p1, xs, s1m, p=0.0, dt=jnp.float32):
        return pk2.pallas_lstm2(xs, s1m, p0.kernel, p0.bias, p1.bias,
                                p0.recurrent, p1.kernel, p1.recurrent,
                                dropout_p=p, seed=SEED, compute_dtype=dt)

    # --- 1. p=0 equivalence (fwd + grads) ------------------------------------
    @jax.jit
    def unfused_out(p0, p1, xs, s1m):
        hs0, _ = lstm_scan(p0, xs, kernel="xla")
        hs1, _ = lstm_scan(p1, hs0 + s1m, kernel="xla")
        return hs1

    @jax.jit
    def fused_out(p0, p1, xs, s1m):
        return fused(p0, p1, xs, s1m)[0]

    a = unfused_out(p0, p1, xs, s1m)
    b = fused_out(p0, p1, xs, s1m)
    print("p=0 fwd max diff:", float(jnp.abs(a - b).max()), flush=True)

    def loss_small(f):
        def loss(p0, p1, xs, s1m):
            hs1 = f(p0, p1, xs, s1m)
            return jnp.sum(hs1[:2, :4, :16].astype(jnp.float32) ** 2)
        return loss

    gu = jax.jit(jax.grad(loss_small(unfused_out), argnums=(0, 1)))(
        p0, p1, xs, s1m)
    gf = jax.jit(jax.grad(loss_small(fused_out), argnums=(0, 1)))(
        p0, p1, xs, s1m)
    for name, ga, gb in [("dW0", gu[0].kernel, gf[0].kernel),
                         ("dU0", gu[0].recurrent, gf[0].recurrent),
                         ("dW1", gu[1].kernel, gf[1].kernel),
                         ("dU1", gu[1].recurrent, gf[1].recurrent)]:
        d = float(jnp.abs(ga - gb).max())
        m = float(jnp.abs(ga).max())
        print(f"p=0 {name}: max abs diff {d:.3e} (ref max {m:.3e})",
              flush=True)

    # --- 2. p=0.5: exact comparison via extracted masks ----------------------
    masks = extract_masks(T, B, H, SEED, 0.5, jnp.float32)
    frac = float(jnp.mean(masks > 0))
    print(f"mask keep fraction: {frac:.3f} (expect ≈0.5)", flush=True)

    @jax.jit
    def ref_masked_out(p0, p1, xs, s1m):
        hs0, _ = lstm_scan(p0, xs, kernel="xla")
        hs1, _ = lstm_scan(p1, hs0 * masks + s1m, kernel="xla")
        return hs1

    @jax.jit
    def fused_drop_out(p0, p1, xs, s1m):
        return fused(p0, p1, xs, s1m, p=0.5)[0]

    a = ref_masked_out(p0, p1, xs, s1m)
    b = fused_drop_out(p0, p1, xs, s1m)
    print("p=0.5 fwd vs mask-reference max diff:",
          float(jnp.abs(a - b).max()), flush=True)

    gu = jax.jit(jax.grad(loss_small(ref_masked_out), argnums=(0, 1)))(
        p0, p1, xs, s1m)
    gf = jax.jit(jax.grad(loss_small(fused_drop_out), argnums=(0, 1)))(
        p0, p1, xs, s1m)
    for name, ga, gb in [("dW0", gu[0].kernel, gf[0].kernel),
                         ("dU0", gu[0].recurrent, gf[0].recurrent),
                         ("dW1", gu[1].kernel, gf[1].kernel),
                         ("dU1", gu[1].recurrent, gf[1].recurrent)]:
        d = float(jnp.abs(ga - gb).max())
        m = float(jnp.abs(ga).max())
        print(f"p=0.5 {name}: max abs diff {d:.3e} (ref max {m:.3e})",
              flush=True)

    # (A directional finite-difference check was tried and dropped: in f32
    # the FD numerator is dominated by rounding noise; the exact
    # mask-reference gradient comparison above is the definitive check.)

    # --- 3. timing (bf16, realistic geometry) --------------------------------
    Tb, Bb = 128, 768
    xsb = jax.random.normal(k[2], (Tb, Bb, D), jnp.bfloat16)
    s1b = 0.1 * jax.random.normal(k[3], (Tb, Bb, H), jnp.bfloat16)

    @jax.jit
    def unfused16(p0, p1, xs, s1m):
        hs0, _ = lstm_scan(p0, xs, compute_dtype=jnp.bfloat16, kernel="pallas")
        hs1, _ = lstm_scan(p1, hs0 + s1m, compute_dtype=jnp.bfloat16,
                           kernel="pallas")
        return hs1

    @jax.jit
    def fused16(p0, p1, xs, s1m):
        return fused(p0, p1, xs, s1m, p=0.0, dt=jnp.bfloat16)[0]

    def timeit(name, f):
        out = f(p0, p1, xsb, s1b)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(p0, p1, xsb, s1b)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"{name}: {(time.perf_counter() - t0) / 20 * 1000:.2f} ms",
              flush=True)

    timeit("unfused-pallas fwd", unfused16)
    timeit("fused fwd", fused16)

    def mkgrad(f):
        def loss(p0, p1, xs, s1m):
            return jnp.sum(f(p0, p1, xs, s1m).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    g_unfused = mkgrad(unfused16)
    g_fused = mkgrad(fused16)
    timeit("unfused-pallas fwd+bwd", lambda *a: g_unfused(*a)[0].recurrent)
    timeit("fused fwd+bwd", lambda *a: g_fused(*a)[0].recurrent)


if __name__ == "__main__":
    main()
