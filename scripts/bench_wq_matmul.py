"""Does XLA fuse int8->bf16 dequantization into a weight-read-bound dot?

Decode-step shapes: activations [B, K] tiny, weights [K, N] huge — the dot
runs at the HBM weight-read floor.  If ``x @ w_i8.astype(bf16) * s`` runs
~2x faster than ``x @ w_bf16``, the convert is fused into the read and
weight-only int8 halves decode time.  If it runs slower/equal, XLA is
materializing a dequantized copy and the idea needs a Pallas kernel.

The op is iterated ITERS times inside ONE jitted fori_loop with a carry
dependence (this rig's remote-TPU tunnel costs ~30 ms per dispatch, which
would swamp a per-call measurement).
"""
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, K, ITERS = 48, 1024, 50
rng = np.random.default_rng(0)


def loop(step, x, *ws):
    def body(_, x):
        y = step(x, *ws)
        # fold the output back into a [B, K] carry so iterations chain
        return (y[:, :K] * 1e-3 + x).astype(x.dtype)

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


for N in (151_936, 3072 * 4):
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    wi8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    s = jnp.asarray(np.abs(rng.standard_normal((N,))) / 127, jnp.float32)

    def step_bf16(x, w):
        return x @ w

    def step_deq(x, w, s):
        return ((x @ w.astype(jnp.bfloat16)).astype(jnp.float32)
                * s[None, :]).astype(jnp.bfloat16)

    def step_w8a8(x, w, s):
        xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xi, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs * s[None, :]).astype(jnp.bfloat16)

    f_bf16 = jax.jit(partial(loop, step_bf16))
    f_deq = jax.jit(partial(loop, step_deq))
    f_w8a8 = jax.jit(partial(loop, step_w8a8))

    t_bf16 = timeit(f_bf16, x, w)
    t_deq = timeit(f_deq, x, wi8, s)
    t_w8a8 = timeit(f_w8a8, x, wi8, s)
    gb = K * N * 2 / 1e9
    print(f"N={N}: bf16 {t_bf16*1e3:.3f} ms ({gb/t_bf16:.0f} GB/s)  "
          f"deq-int8 {t_deq*1e3:.3f} ms ({gb/2/t_deq:.0f} GB/s eff)  "
          f"w8a8 {t_w8a8*1e3:.3f} ms ({gb/2/t_w8a8:.0f} GB/s eff)")
