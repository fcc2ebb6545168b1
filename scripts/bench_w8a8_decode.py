"""Full-decode W8A8 probe: can int8 x int8 dots halve the per-step weight
read for ALL decoder matmuls, not just the LM head?

The decode step is weight-read-bound: ~881 MB/step of layer weights
(qkv/o/gate-up/down across 28 layers) + ~311 MB lm_head at b48
(docs/performance.md stage table).  ops/wq_head.py already beat bf16 on
the head (0.730 vs 0.941 ms) with a native int8 MXU dot off a transposed
weight.  This bench asks whether the same trade pays on the LAYER
matmuls, where N is small (1024-6144) and XLA — not a custom kernel —
lowers the dot.  Three variants at the real Qwen3-0.6B decode shapes
(B=48, K=1024, 28 layers via lax.scan, dependency-chained steps):

- bf16:   x@W in bf16 (the shipped path's arithmetic)
- w8a8:   per-row dynamic int8 activation, int8 weight [K, N], int32
          accumulate, f32 scale epilogue (pure XLA dot_general)
- w8a8t:  same, weight stored transposed [N, K] and contracted on dim 1
          (the wq_head layout finding: contiguous per-tile HBM reads)

If int8 reads at the bf16 dot's BYTE rate, the step's layer-weight
traffic halves => ~2x on this stage.  If XLA's int8 lowering converts or
reads no faster, this parks the idea with numbers.

The reference serves unquantized fp16/bf16 torch decoder layers
(/root/reference/tiny_audio/asr_modeling.py:634-640); this probe is
TPU-serving bandwidth machinery with no reference counterpart.

Run: python scripts/bench_w8a8_decode.py   (axon/TPU env)
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, K, L = 48, 1024, 28
N_QKV = 4096      # q (16*128) + k (8*128) + v (8*128)
N_O_IN = 2048     # o_proj input dim (16*128)
N_FFN = 3072
ITERS = 20

LAYER_BYTES_BF16 = (K * N_QKV + N_O_IN * K + K * 2 * N_FFN + N_FFN * K) * 2


def quant_w(w, transpose):
    """Per-output-channel symmetric int8; optionally stored [N, K]."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return (q.T if transpose else q), scale.astype(jnp.float32)


def quant_act(x):
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                    -127, 127).astype(jnp.int8)
    return x_i8, sx


def mm(x, w, scale, mode):
    if mode == "bf16":
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    x_i8, sx = quant_act(x)
    cdim = 1 if mode == "w8a8t" else 0
    acc = jax.lax.dot_general(
        x_i8, w, (((1,), (cdim,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * scale[None, :]).astype(
        jnp.bfloat16)


def make_step(mode):
    def layer(x, ws):
        (w_qkv, s_qkv), (w_o, s_o), (w_gu, s_gu), (w_d, s_d) = ws
        qkv = mm(x, w_qkv, s_qkv, mode)                       # [B, 4096]
        o = mm(qkv[:, :N_O_IN], w_o, s_o, mode)               # [B, 1024]
        gu = mm(x + o, w_gu, s_gu, mode)                      # [B, 6144]
        act = jax.nn.silu(gu[:, :N_FFN].astype(jnp.float32)) * \
            gu[:, N_FFN:].astype(jnp.float32)
        d = mm(act.astype(jnp.bfloat16), w_d, s_d, mode)      # [B, 1024]
        return (x + d * 1e-3).astype(x.dtype), None

    def step(x, weights):
        x, _ = jax.lax.scan(layer, x, weights)
        return x

    return step


def run(mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

    def mk(k, n):
        w = jnp.asarray(rng.standard_normal((L, k, n)) / np.sqrt(k),
                        jnp.float32)
        if mode == "bf16":
            return w.astype(jnp.bfloat16), jnp.ones((L, n), jnp.float32)
        qs = [quant_w(w[i], mode == "w8a8t") for i in range(L)]
        return (jnp.stack([q for q, _ in qs]),
                jnp.stack([s for _, s in qs]))

    weights = (mk(K, N_QKV), mk(N_O_IN, K), mk(K, 2 * N_FFN), mk(N_FFN, K))
    step = make_step(mode)

    def chained(x0, weights):
        def body(_, xc):
            return step(xc, weights)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    f = jax.jit(chained)
    out = f(x, weights)
    block_until_ready_via_host(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(x, weights)
        block_until_ready_via_host(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / ITERS * 1e3
    wbytes = L * LAYER_BYTES_BF16 * (1.0 if mode == "bf16" else 0.5)
    print(f"{mode:6s}: {ms:7.3f} ms/step-of-layers   "
          f"weights {wbytes / 1e6:.0f} MB -> "
          f"{wbytes / 1e9 / (ms / 1e3):.0f} GB/s", flush=True)
    return ms


def main():
    enable_persistent_compile_cache()
    print(f"decode layer-matmul shootout: B={B} K={K} L={L} "
          f"(qkv {N_QKV}, ffn {N_FFN}), iters={ITERS}", flush=True)
    for mode in ("bf16", "w8a8", "w8a8t"):
        try:
            run(mode)
        except Exception as e:
            print(f"{mode:6s}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)


if __name__ == "__main__":
    main()
