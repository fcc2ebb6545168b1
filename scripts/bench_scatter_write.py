"""Microbench: per-row KV-cache write (scatter) vs scalar dynamic_update_slice.

Decides the continuous-batching design (tiny_audio_tpu/continuous.py): slots
decode at PER-ROW positions, so the once-per-step cache write needs a scatter
``cache.at[:, iota(B), pos_b]`` instead of the uniform-batch loops' scalar-index
``dynamic_update_slice`` at ``(0, 0, cache_index, 0, 0)``.  TPU scatter can
lower to a serial update loop; if it costs milliseconds it would erase the
early-exit win continuous batching is for.  This measures both writes in
isolation AND inside a 28-layer-shaped decode-step-like loop carry.

Run on the real TPU: ``python scripts/bench_scatter_write.py``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

# Qwen3-0.6B serving shapes: 28 layers, 8 kv heads, head_dim 128, int8 cache
L, B, S, H, D = 28, 48, 640, 8, 128
STEPS = 64


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    laps = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        laps.append(time.time() - t0)
    return float(np.median(laps)), out


def main() -> None:
    key = jax.random.PRNGKey(0)
    cache = {
        "k": jnp.zeros((L, B, S, H, D), jnp.int8),
        "v": jnp.zeros((L, B, S, H, D), jnp.int8),
        "k_scale": jnp.zeros((L, B, S, H), jnp.float32),
        "v_scale": jnp.zeros((L, B, S, H), jnp.float32),
    }
    fresh = jax.random.normal(key, (L, B, 1, H, D), jnp.bfloat16)
    pos = jnp.asarray(np.random.default_rng(0).integers(100, 500, B), jnp.int32)

    @jax.jit
    def loop_scalar(cache, fresh, start):
        # uniform-batch baseline: STEPS scalar-index writes in a carry loop
        def body(i, c):
            k8 = fresh[:, :, :].astype(jnp.int8)
            c = dict(c)
            c["k"] = jax.lax.dynamic_update_slice(c["k"], k8, (0, 0, start + i, 0, 0))
            c["v"] = jax.lax.dynamic_update_slice(c["v"], k8, (0, 0, start + i, 0, 0))
            return c
        return jax.lax.fori_loop(0, STEPS, body, cache)

    @jax.jit
    def loop_scatter(cache, fresh, pos):
        # continuous mode: per-row write index advancing each step
        rows = jnp.arange(B)
        def body(i, carry):
            c, p = carry
            k8 = fresh[:, :, 0].astype(jnp.int8)  # [L, B, H, D]
            c = dict(c)
            c["k"] = c["k"].at[:, rows, p].set(k8, unique_indices=True)
            c["v"] = c["v"].at[:, rows, p].set(k8, unique_indices=True)
            return c, p + 1
        c, _ = jax.lax.fori_loop(0, STEPS, body, (cache, pos))
        return c

    t_scalar, _ = timeit(loop_scalar, cache, fresh, jnp.int32(100))
    t_scatter, _ = timeit(loop_scatter, cache, fresh, pos)
    per_scalar = t_scalar / STEPS * 1000
    per_scatter = t_scatter / STEPS * 1000
    print(f"scalar DUS write : {per_scalar:.3f} ms/step")
    print(f"per-row scatter  : {per_scatter:.3f} ms/step")
    print(f"delta            : {per_scatter - per_scalar:+.3f} ms/step "
          f"(decode step is ~3.9 ms at b48)")


if __name__ == "__main__":
    main()
