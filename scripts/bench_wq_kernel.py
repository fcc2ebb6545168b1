"""Pallas int8-weight matmul vs bf16 dot at decode shapes (real TPU).

scripts/bench_wq_matmul.py established that XLA's dequantize-then-dot does
NOT beat the bf16 dot (the convert materializes).  This measures whether
the in-VMEM-dequant Pallas kernel (ops/wq_matmul.py) reaches the int8
weight-read floor — the gate for weight-only-quantized decode serving.

Shapes are the flagship decoder's decode-step matmuls at serving batch 48:
qkv/o (K=1024), MLP up/gate and down (K=1024/3072), and the LM head
(N=151936) that dominates the per-step weight traffic.

Run: python - < scripts/bench_wq_kernel.py   (axon/TPU env)
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tiny_audio_tpu.ops.wq_matmul import quantize_weight, wq_matmul
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, ITERS = 48, 50
SHAPES = [  # (K, N, label)
    (1024, 2048, "qkv"),
    (1024, 3072, "mlp_up"),
    (3072, 1024, "mlp_down"),
    (1024, 151_936, "lm_head"),
]


def loop(step, x, *ws):
    k = x.shape[1]

    def body(_, x):
        y = step(x, *ws)  # [B, N]; fold into the [B, K] carry either way
        n = y.shape[1]
        if n >= k:
            delta = y[:, :k]
        else:
            delta = jnp.pad(y, ((0, 0), (0, k - n)))
        return (delta.astype(jnp.float32) * 1e-3 + x.astype(jnp.float32)
                ).astype(x.dtype)

    return jax.lax.fori_loop(0, ITERS, body, x)


def timeit(fn, *args, n=5):
    out = fn(*args)
    block_until_ready_via_host(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        block_until_ready_via_host(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS


def main():
    rng = np.random.default_rng(0)
    for k, n, label in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        w_i8, scale = quantize_weight(w)

        f_bf16 = jax.jit(partial(loop, lambda x, w: x @ w))
        f_wq = jax.jit(partial(loop, wq_matmul))

        t_bf16 = timeit(f_bf16, x, w)
        t_wq = timeit(f_wq, x, w_i8, scale)
        gb = k * n * 2 / 1e9
        print(
            f"{label:9s} K={k} N={n}: "
            f"bf16 {t_bf16 * 1e3:.3f} ms ({gb / t_bf16:.0f} GB/s)   "
            f"wq-pallas {t_wq * 1e3:.3f} ms "
            f"({gb / 2 / t_wq:.0f} GB/s eff, {t_bf16 / t_wq:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
