"""Microbenchmark: fused Pallas FFN vs XLA's unfused fc1/GELU/fc2 at the
flagship encoder shape (B=32 x 1536 frames, d=1280, ffn=5120, bf16).

docs/performance.md pegs the unfused MLP at ~6.5 ms of matmul + ~5.7 ms of
tanh-GELU per layer (4.3 ms of that GELU is HBM traffic for the [49k,
5120] intermediate).  The fused kernel (ops/encoder_ffn.py) chains both
matmuls through VMEM so the intermediate never touches HBM.

Run on the real TPU:
    PYTHONPATH=/root/.axon_site:. python scripts/bench_encoder_ffn.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.ops.encoder_ffn import encoder_ffn_tpu, naive_ffn
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

M, D, F = 32 * 1536, 1280, 5120
REPS = 20


def time_fn(name, fn, x, w1, b1, w2, b2):
    # LICM-proof fused loop: each iteration's input depends on the last output
    @jax.jit
    def loop(x0):
        def body(i, acc):
            return fn(x0 + acc[0, 0].astype(x0.dtype) * 1e-12, w1, b1, w2, b2)
        return jax.lax.fori_loop(0, REPS, body, x0)

    out = loop(x)
    block_until_ready_via_host(out)
    t0 = time.perf_counter()
    out = loop(x)
    block_until_ready_via_host(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    flops = 2.0 * M * D * F * 2
    print(f"{name:24s} {ms:7.3f} ms  {flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s",
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, F)) / np.sqrt(D), jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.standard_normal(F), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D)) / np.sqrt(F), jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.standard_normal(D), jnp.bfloat16)

    print(f"shape M={M} D={D} F={F}, bf16, {REPS}-rep fused loop", flush=True)
    time_fn("xla-unfused", lambda *a: naive_ffn(*a, dtype=jnp.bfloat16),
            x, w1, b1, w2, b2)
    time_fn("pallas-fused", lambda *a: encoder_ffn_tpu(*a), x, w1, b1, w2, b2)

    # numerical error vs a float64 CPU oracle on a row slice
    ns = 4096
    xs = np.asarray(x[:ns], np.float64)
    h = xs @ np.asarray(w1, np.float64) + np.asarray(b1, np.float64)
    c = 0.7978845608028654
    g = 0.5 * h * (1.0 + np.tanh(c * (h + 0.044715 * h**3)))
    oracle = g @ np.asarray(w2, np.float64) + np.asarray(b2, np.float64)
    for name, fn in (
        ("xla-unfused", lambda *a: naive_ffn(*a, dtype=jnp.bfloat16)),
        ("pallas-fused", lambda *a: encoder_ffn_tpu(*a)),
    ):
        out = np.asarray(fn(x, w1, b1, w2, b2)[:ns], np.float64)
        scale = np.abs(oracle).max()
        print(f"max|{name} - fp64|/max|fp64| = "
              f"{np.abs(out - oracle).max() / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
