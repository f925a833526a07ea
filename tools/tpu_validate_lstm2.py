"""TPU validation for the fused two-layer LSTM kernel.

Run on real TPU (not part of the CPU test suite):
  python tools/tpu_validate_lstm2.py

Checks:
  1. p=0 forward/backward match the unfused scans (like the CPU tests, but
     compiled through Mosaic).
  2. p>0: dropout statistics (keep fraction ≈ keep_prob, scaling correct).
  3. p>0: the custom-VJP gradient passes a directional finite-difference
     check — this validates that the backward kernel regenerates the exact
     forward masks.
  4. Timing vs the unfused pair.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from music_generator_tpu.ops.lstm import lstm_init, lstm_scan
from music_generator_tpu.ops.pallas_lstm2 import pallas_lstm2


def main():
    T, B, D, H = 128, 768, 94, 256
    k = jax.random.split(jax.random.key(0), 4)
    p0 = lstm_init(k[0], D, H)
    p1 = lstm_init(k[1], H, H)
    xs = jax.random.normal(k[2], (T, B, D), jnp.float32)
    s1m = 0.1 * jax.random.normal(k[3], (T, B, H), jnp.float32)

    def fused(p0, p1, xs, s1m, p=0.0, dt=jnp.float32):
        xw0 = ((xs.reshape(T * B, D).astype(dt) @ p0.kernel.astype(dt)
                + p0.bias.astype(dt)).reshape(T, B, 4 * H))
        return pallas_lstm2(xw0, s1m, p1.bias, p0.recurrent, p1.kernel,
                            p1.recurrent, dropout_p=p, seed=7,
                            compute_dtype=dt)

    # --- 1. p=0 equivalence -------------------------------------------------
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
    print("p=0 fwd max diff:", float(jnp.abs(a - b).max()))

    # --- 2. dropout statistics ----------------------------------------------
    @jax.jit
    def fused_drop(p0, p1, xs, s1m):
        return fused(p0, p1, xs, s1m, p=0.5)[0]

    hs_p0 = fused_out(p0, p1, xs, s1m)
    hs_p5 = fused_drop(p0, p1, xs, s1m)
    differs = float(jnp.mean((jnp.abs(hs_p0 - hs_p5) > 1e-6)))
    print(f"p=0.5 changes {differs:.1%} of outputs (expect ≈100%)")

    # --- 3. directional finite difference through dropout --------------------
    def loss(s1m_in):
        hs1, _ = fused(p0, p1, xs, s1m_in, p=0.5)
        return jnp.sum(hs1.astype(jnp.float32) ** 2)

    loss_j = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(s1m)
    v = jax.random.normal(jax.random.key(9), s1m.shape) * 0.1
    eps = 1e-3
    fd = (float(loss_j(s1m + eps * v)) - float(loss_j(s1m - eps * v))) / (2 * eps)
    an = float(jnp.sum(g * v))
    print(f"directional FD={fd:.4f} vs VJP={an:.4f} "
          f"rel err {abs(fd - an) / max(1e-9, abs(fd)):.2e}")

    # --- 4. timing (bf16) ----------------------------------------------------
    xs16 = xs.astype(jnp.bfloat16)
    s16 = s1m.astype(jnp.bfloat16)

    @jax.jit
    def unfused16(p0, p1, xs, s1m):
        hs0, _ = lstm_scan(p0, xs, compute_dtype=jnp.bfloat16, kernel="pallas")
        hs1, _ = lstm_scan(p1, hs0 + s1m, compute_dtype=jnp.bfloat16,
                           kernel="pallas")
        return hs1

    @jax.jit
    def fused16(p0, p1, xs, s1m):
        return fused(p0, p1, xs, s1m, p=0.0, dt=jnp.bfloat16)[0]

    for name, f in [("unfused-pallas", unfused16), ("fused", fused16)]:
        out = f(p0, p1, xs16, s16)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(p0, p1, xs16, s16)
        float(jnp.sum(out.astype(jnp.float32)))
        print(f"{name} fwd: {(time.perf_counter() - t0) / 20 * 1000:.2f} ms")

    def mkgrad(f):
        def loss(p0, p1, xs, s1m):
            return jnp.sum(f(p0, p1, xs, s1m).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    for name, f in [("unfused-pallas", unfused16), ("fused", fused16)]:
        g = mkgrad(f)
        out = g(p0, p1, xs16, s16)
        float(jnp.sum(out[0].recurrent))
        t0 = time.perf_counter()
        for _ in range(20):
            out = g(p0, p1, xs16, s16)
        float(jnp.sum(out[0].recurrent))
        print(f"{name} fwd+bwd: {(time.perf_counter() - t0) / 20 * 1000:.2f} ms")


if __name__ == "__main__":
    main()
